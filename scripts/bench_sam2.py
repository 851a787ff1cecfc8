#!/usr/bin/env python
"""Serving-path benchmark for the SAM2 predictors on the attached TPU:
embedding (set_image) and steady-state prompt->mask latency.

Usage: python scripts/bench_sam2.py [--config sam2_hiera_s] [--n 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="sam2_hiera_s")
    p.add_argument("--n", type=int, default=20)
    p.add_argument("--hw", type=int, nargs=2, default=(720, 960))
    args = p.parse_args()

    import numpy as np

    from sam2unet_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax.numpy as jnp

    from sam2unet_tpu.build_sam import build_sam2
    from sam2unet_tpu.predictors.image_predictor import SAM2ImagePredictor

    model, variables = build_sam2(args.config, dtype=jnp.bfloat16)
    pred = SAM2ImagePredictor(model, variables)
    rng = np.random.default_rng(0)
    image = (rng.random((*args.hw, 3)) * 255).astype(np.uint8)

    pred.set_image(image)  # compile
    t0 = time.perf_counter()
    pred.set_image(image)
    embed_s = time.perf_counter() - t0

    pt = np.array([[args.hw[1] / 2, args.hw[0] / 2]])

    def steady_state():
        pred.predict(point_coords=pt, point_labels=np.array([1]))  # compile
        t0 = time.perf_counter()
        for i in range(args.n):
            pred.predict(point_coords=pt + i, point_labels=np.array([1]))
        return (time.perf_counter() - t0) / args.n

    per_predict = steady_state()  # device-side postprocess (default)
    pred._transforms.max_hole_area = -1.0  # forces the host-postprocess path
    per_host = steady_state()
    pred._transforms.max_hole_area = 0.0

    print(f"{args.config}: set_image {embed_s * 1e3:.0f} ms, "
          f"predict {per_predict * 1e3:.1f} ms "
          f"({1.0 / per_predict:.1f} prompts/s steady state); "
          f"host-postprocess path {per_host * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
