#!/usr/bin/env python
"""Deployed-model inference harness — the reference test_onnx.py analog:
runs an exported artifact over a test set, saves masks, evaluates vs GT."""
import argparse
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--test_image_path", type=str, required=True)
    p.add_argument("--test_gt_path", type=str, default="")
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--size", type=int, default=960)
    p.add_argument("--backend", default="stablehlo",
                   choices=["stablehlo", "tf", "onnx", "openvino"])
    args = p.parse_args()

    if args.backend == "stablehlo":
        # this backend runs under jax; honor JAX_PLATFORMS before the
        # first operation initializes the backend (one-shot)
        from sam2unet_tpu.utils.jax_setup import setup_jax

        setup_jax()

    import numpy as np
    from PIL import Image

    from sam2unet_tpu.deploy.segmenter import SamUnetSegmenter
    from sam2unet_tpu.eval.metrics import (
        evaluate_dataset, evaluate_segmentation_performance, print_eval_report,
    )

    seg = SamUnetSegmenter(args.model_path, input_size=args.size,
                           backend=args.backend)
    os.makedirs(args.save_path, exist_ok=True)
    names = sorted(f for f in os.listdir(args.test_image_path)
                   if f.endswith((".jpg", ".png")))
    results, times = [], []
    log_path = os.path.join(args.save_path, "log.txt")
    for i, name in enumerate(names):
        image = np.asarray(
            Image.open(os.path.join(args.test_image_path, name)).convert("RGB")
        )
        t0 = time.perf_counter()
        mask = seg.segment(image)
        times.append(time.perf_counter() - t0)
        out_name = os.path.splitext(name)[0] + ".png"
        Image.fromarray(mask).save(os.path.join(args.save_path, out_name))
        if args.test_gt_path:
            gt = np.asarray(Image.open(
                os.path.join(args.test_gt_path, out_name)).convert("L"))
            r = evaluate_segmentation_performance(mask, gt)
            print_eval_report(r, title=f"[{i + 1}/{len(names)}] {name}",
                              log_path=log_path)
            results.append(r)
    if results:
        print_eval_report(evaluate_dataset(results),
                          title="Segmentation Evaluation", log_path=log_path)
    if times:
        print(f"average process_time: {sum(times) / len(times):.4f}s")


if __name__ == "__main__":
    main()
