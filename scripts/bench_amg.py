#!/usr/bin/env python
"""Automatic-mask-generator smoke/bench on the attached TPU: full-image
mask generation wall time + record count (amg path never exercised on
hardware otherwise — covers crops pyramid, batched decode, NMS, RLE).

Usage: python scripts/bench_amg.py [--points 16] [--hw 480 640]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="sam2_hiera_t")
    p.add_argument("--points", type=int, default=16)
    p.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    args = p.parse_args()

    import numpy as np

    from sam2unet_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax.numpy as jnp

    from sam2unet_tpu.build_sam import build_sam2
    from sam2unet_tpu.predictors.amg import SAM2AutomaticMaskGenerator

    model, variables = build_sam2(args.config, dtype=jnp.bfloat16)
    # with random-init weights the iou/stability filters would reject
    # everything; zero them so the full pipeline (decode, dedup, NMS, RLE)
    # runs and returns records
    amg = SAM2AutomaticMaskGenerator(
        model, variables, points_per_side=args.points,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
    )

    rng = np.random.default_rng(0)
    h, w = args.hw
    yy, xx = np.mgrid[:h, :w]
    img = np.stack(
        [
            127 + 90 * np.sin(yy / 37.0),
            127 + 90 * np.cos(xx / 29.0),
            (rng.random((h, w)) * 60 + 90),
        ],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)
    img[((yy - h // 2) ** 2 + (xx - w // 2) ** 2) < (h // 4) ** 2] = 240

    t0 = time.time()
    records = amg.generate(img)  # includes compiles
    first = time.time() - t0
    t0 = time.time()
    records = amg.generate(img)
    steady = time.time() - t0

    areas = sorted((r["area"] for r in records), reverse=True)[:5]
    print(f"{args.config} {h}x{w} points={args.points}: "
          f"{len(records)} masks, first {first:.1f}s, steady {steady:.2f}s; "
          f"top areas {areas}")
    assert records, "AMG produced no masks"
    for r in records[:3]:
        assert r["segmentation"].shape == (h, w)
        assert 0.0 <= r["predicted_iou"] <= 1.5
    print("AMG OK")


if __name__ == "__main__":
    main()
