"""Device-side (jit) batched semantic metrics.

The reference computes all metrics on host per image (train.py:95-123);
here the pixel-level IoU/Dice reduction runs on-device over whole padded
batches with validity masking, so the per-epoch eval loop ships only a few
scalars back per batch. Instance metrics (connected components + greedy
matching) remain host-side in eval/metrics.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("threshold", "gt_threshold"))
def batched_semantic_metrics(
    pred_probs: jnp.ndarray,   # (B, H, W) in [0, 1] (or logits>thresholded)
    gt: jnp.ndarray,           # (B, H, W) in [0, 255], or bool
    valid: jnp.ndarray,        # (B,) bool — padded batch entries masked out
    pixel_valid: jnp.ndarray | None = None,  # (B, H, W) un-padded region
    threshold: float = 0.1,
    gt_threshold: float | None = None,  # override for non-[0,255] GT, e.g.
                                        # 0.5 for {0,1}-valued masks
):
    """Returns per-image (iou (B,), dice (B,)); invalid entries are zero.

    With `pixel_valid` the prediction binarization reproduces the
    reference eval exactly (train.py:109-112 + eval.py binarize): per-image
    min-max normalize over the UN-PADDED region, scale to 255, truncate to
    uint8, threshold at 255*0.1 — without it, sigmoid probabilities are
    thresholded raw (a different metric when outputs are uniformly
    low/high confidence)."""
    if pixel_valid is not None:
        pf = pred_probs.astype(jnp.float32)
        inf = jnp.float32(jnp.inf)
        pmin = jnp.min(jnp.where(pixel_valid, pf, inf), axis=(1, 2),
                       keepdims=True)
        pmax = jnp.max(jnp.where(pixel_valid, pf, -inf), axis=(1, 2),
                       keepdims=True)
        norm = (pf - pmin) / (pmax - pmin + 1e-8)
        # uint8 cast truncates, so "> 25.5" means floor(norm*255) >= 26
        p = (jnp.floor(norm * 255.0) > 255.0 * threshold) & pixel_valid
    else:
        p = pred_probs > threshold
    if gt_threshold is None:
        # default GT domain is the reference's: uint8-style [0, 255]
        # binarized at 255*threshold (eval.py:88-89); bool masks pass
        # through. A {0,1} float/int GT must set gt_threshold explicitly
        # (0.5) — the 25.5 default would silently zero it.
        gt_threshold = 0.5 if gt.dtype == jnp.bool_ else 255.0 * threshold
    g = gt > gt_threshold
    inter = jnp.sum(p & g, axis=(1, 2)).astype(jnp.float32)
    union = jnp.sum(p | g, axis=(1, 2)).astype(jnp.float32)
    sums = jnp.sum(p, axis=(1, 2)) + jnp.sum(g, axis=(1, 2))
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0)
    dice = jnp.where(sums > 0, 2 * inter / jnp.maximum(sums, 1), 0.0)
    v = valid.astype(jnp.float32)
    return iou * v, dice * v
