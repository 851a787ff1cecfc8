"""Inference entry point — flag-compatible with the reference test.py:13-35.

Per-image predict -> crop letterbox padding -> resize to GT size -> sigmoid
-> min-max -> uint8 PNG, with mean wall-clock timing (test.py:52-86)."""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
from PIL import Image

from sam2unet_tpu.cli.common import (
    build_model,
    init_variables,
    load_weights,
    postprocess_prediction,
)
from sam2unet_tpu.data.dataset import EvalDataset


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--test_image_path", type=str, required=True)
    p.add_argument("--test_gt_path", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--size", default=960, type=int)
    p.add_argument("--model_cfg", type=str, default="sam2_hiera_s")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--batch_size", default=1, type=int,
                   help="device batch (reference runs 1 image per call; "
                        ">1 amortizes dispatch/readback for throughput)")
    return p


def main(args) -> None:
    import jax
    import jax.numpy as jnp

    test_loader = EvalDataset(args.test_image_path, args.test_gt_path, args.size)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model, _ = build_model(args.model_cfg, dtype=dtype)
    variables = init_variables(model, args.size)
    variables = load_weights(variables, checkpoint=args.checkpoint)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    os.makedirs(args.save_path, exist_ok=True)

    def save(logits_1hwc, gt, name, padding):
        res = postprocess_prediction(logits_1hwc, padding, args.size, gt.shape)
        print("Saving " + args.save_path + "/" + name)
        out_name = os.path.splitext(name)[0] + ".png"
        Image.fromarray(res).save(os.path.join(args.save_path, out_name))

    times = []
    if args.batch_size > 1:
        # fixed-shape batched forward (pads the tail); per-image host
        # postprocess unchanged, so outputs are identical to batch 1
        for eb in test_loader.batches(args.batch_size):
            t0 = time.perf_counter()
            logits, _, _ = fwd(variables, jnp.asarray(eb["image"]))
            logits = np.asarray(logits)  # blocks
            times.append((time.perf_counter() - t0) / eb["valid"])
            for j in range(eb["valid"]):
                save(logits[j : j + 1], eb["gt"][j], eb["name"][j],
                     tuple(int(v) for v in eb["padding"][j]))
    else:
        for _ in range(test_loader.count):
            image, gt, name, padding = test_loader.load_data()
            t0 = time.perf_counter()
            logits, _, _ = fwd(variables, jnp.asarray(image))
            logits = np.asarray(logits)  # blocks
            times.append(time.perf_counter() - t0)
            save(logits, gt, name, padding)

    if times:
        # first call includes compile; report both like a careful bench
        steady = times[1:] or times
        print(f"mean_test_time: {sum(steady) / len(steady):.4f}s "
              f"(first call {times[0]:.2f}s incl. compile)")


def run() -> None:
    main(build_parser().parse_args())


if __name__ == "__main__":
    run()
