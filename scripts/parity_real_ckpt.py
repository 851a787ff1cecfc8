#!/usr/bin/env python
"""One-command real-pretrained-checkpoint parity vs the reference.

BASELINE.json's north star — <= 0.003 mDice delta vs the reference on
CVC-300/CAMO with real trained weights — is egress-blocked on this image
(no weights, no datasets). This script makes running it zero-marginal-cost
the moment files appear:

    python scripts/parity_real_ckpt.py \
        [--hiera_ckpt sam2_hiera_small.pt] \
        --sam2unet_ckpt SAM2-UNet-xx.pth --dataset_dir <CVC-300 dir> \
        [--size 352] [--gate 0.003]

What runs:
  1. (optional) the SAM2 trunk checkpoint is converted + strict-validated
     against our parameter tree — the build_sam.py:79-89 load contract.
  2. REFERENCE leg: the reference's own SAM2UNet torch modules are
     executed in-place (tests/ref_loader.py — nothing copied), the
     .pth strict-loaded (test.py:44-45), and every dataset image pushed
     through forward + the reference postprocess (test.py:66-76).
  3. OUR leg: the same .pth through our converter into the JAX model via
     the test-CLI plumbing (cli/common.py), identical postprocess.
  4. Both prediction sets are scored with the evaluator (eval/metrics.py,
     byte-compatible with the reference eval.py:55-225) and the mDice /
     mIoU deltas printed against the gate; exit 1 on gate failure.

Environment caveat (documented, not hidden): torchvision/skimage/cv2 are
absent from this image, so the reference leg reuses our deterministic
letterbox preprocessing and evaluator — each separately parity-pinned
against the reference implementations by the test suite
(tests/test_data_and_metrics.py, tests/test_model_parity.py). On a box
with the full reference deps, the reference's own test.py/eval.py can be
run instead and compared via the same report.

Exercised end-to-end on synthetic data by
tests/test_parity_real_ckpt.py (a randomly-initialized reference
checkpoint stands in for the real one).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

SUBDIR_CANDIDATES = [
    ("images", "masks"),
    ("Imgs", "GT"),
    ("image", "mask"),
    ("Image", "GT_Object"),
    ("Frame", "GT"),
]


def find_split(dataset_dir: str, image_subdir: str, gt_subdir: str):
    if image_subdir and gt_subdir:
        return (
            os.path.join(dataset_dir, image_subdir),
            os.path.join(dataset_dir, gt_subdir),
        )
    for img, gt in SUBDIR_CANDIDATES:
        a, b = os.path.join(dataset_dir, img), os.path.join(dataset_dir, gt)
        if os.path.isdir(a) and os.path.isdir(b):
            return a, b
    raise FileNotFoundError(
        f"no (images, masks) subdirectory pair found under {dataset_dir}; "
        f"tried {SUBDIR_CANDIDATES} — pass --image_subdir/--gt_subdir"
    )


def reference_predictions(ckpt: str, dataset, size: int) -> dict[str, np.ndarray]:
    """name -> uint8 prediction map from the reference torch model."""
    import torch

    from ref_loader import load_ref_sam2unet_class

    from sam2unet_tpu.cli.common import postprocess_prediction

    RefSAM2UNet = load_ref_sam2unet_class()
    model = RefSAM2UNet()
    state = torch.load(ckpt, map_location="cpu", weights_only=True)
    # strict load is the reference contract (test.py:44-45)
    model.load_state_dict(state, strict=True)
    model.eval()

    preds = {}
    dataset.reset_index()
    with torch.no_grad():
        for _ in range(dataset.count):
            image, gt, name, padding = dataset.load_data()
            x = torch.from_numpy(
                np.ascontiguousarray(image.transpose(0, 3, 1, 2))
            )
            out, _, _ = model(x)
            logits = out.numpy().transpose(0, 2, 3, 1)
            preds[name] = postprocess_prediction(
                logits, padding, size, gt.shape
            )
    return preds


def our_predictions(
    ckpt: str, dataset, size: int, model_cfg: str
) -> dict[str, np.ndarray]:
    """name -> uint8 prediction map from our JAX model (converted .pth)."""
    import jax

    from sam2unet_tpu.cli.common import (
        build_model,
        init_variables,
        load_weights,
        postprocess_prediction,
    )

    model, _ = build_model(model_cfg)
    variables = init_variables(model, size)
    variables = load_weights(variables, checkpoint=ckpt)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    preds = {}
    dataset.reset_index()
    for _ in range(dataset.count):
        image, gt, name, padding = dataset.load_data()
        out, _, _ = fwd(variables, image)
        preds[name] = postprocess_prediction(
            np.asarray(out), padding, size, gt.shape
        )
    return preds


def score(preds: dict[str, np.ndarray], dataset) -> dict:
    from sam2unet_tpu.eval.metrics import (
        evaluate_dataset,
        evaluate_segmentation_performance,
    )

    per_image = []
    dataset.reset_index()
    for _ in range(dataset.count):
        _, gt, name, _ = dataset.load_data()
        per_image.append(
            evaluate_segmentation_performance(
                preds[name].astype(np.float64), gt
            )
        )
    return evaluate_dataset(per_image)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--hiera_ckpt", default="",
                   help="official sam2_hiera_*.pt — converter strict-check "
                        "only (the trained .pth already carries the trunk)")
    p.add_argument("--sam2unet_ckpt", required=True,
                   help="trained reference SAM2-UNet .pth")
    p.add_argument("--dataset_dir", required=True)
    p.add_argument("--image_subdir", default="")
    p.add_argument("--gt_subdir", default="")
    p.add_argument("--size", type=int, default=352)
    p.add_argument("--model_cfg", default="sam2_hiera_s")
    p.add_argument("--gate", type=float, default=0.003,
                   help="max |mDice delta| (BASELINE.json)")
    args = p.parse_args()

    from sam2unet_tpu.utils.jax_setup import setup_jax

    setup_jax()

    if args.hiera_ckpt:
        from sam2unet_tpu.cli.common import (
            build_model,
            init_variables,
            load_weights,
        )

        model, _ = build_model(args.model_cfg)
        variables = init_variables(model, args.size)
        load_weights(variables, hiera_path=args.hiera_ckpt)
        print(f"[parity] trunk checkpoint {args.hiera_ckpt}: "
              "strict conversion OK")

    from sam2unet_tpu.data.dataset import EvalDataset

    image_root, gt_root = find_split(
        args.dataset_dir, args.image_subdir, args.gt_subdir
    )
    dataset = EvalDataset(image_root, gt_root, args.size)
    print(f"[parity] dataset: {dataset.count} images from {image_root}")

    print("[parity] reference leg (torch, in-place modules)...")
    ref_preds = reference_predictions(args.sam2unet_ckpt, dataset, args.size)
    print("[parity] our leg (JAX, converted checkpoint)...")
    our_preds = our_predictions(
        args.sam2unet_ckpt, dataset, args.size, args.model_cfg
    )

    ref_scores = score(ref_preds, dataset)
    our_scores = score(our_preds, dataset)

    max_px = max(
        float(np.abs(ref_preds[n].astype(np.int32)
                     - our_preds[n].astype(np.int32)).max())
        for n in ref_preds
    )
    d_dice = abs(ref_scores["mDice"] - our_scores["mDice"])
    d_iou = abs(ref_scores["mIoU"] - our_scores["mIoU"])
    report = {
        "dataset": args.dataset_dir,
        "images": dataset.count,
        "ref_mDice": round(ref_scores["mDice"], 5),
        "our_mDice": round(our_scores["mDice"], 5),
        "mDice_delta": round(d_dice, 5),
        "ref_mIoU": round(ref_scores["mIoU"], 5),
        "our_mIoU": round(our_scores["mIoU"], 5),
        "mIoU_delta": round(d_iou, 5),
        "max_abs_px_diff_uint8": max_px,
        "gate": args.gate,
        "pass": bool(d_dice <= args.gate),
    }
    print(json.dumps(report))
    if not report["pass"]:
        print(f"[parity] FAIL: mDice delta {d_dice:.5f} > gate {args.gate}",
              file=sys.stderr)
        return 1
    print(f"[parity] PASS: mDice delta {d_dice:.5f} <= gate {args.gate}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
