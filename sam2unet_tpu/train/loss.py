"""Structure loss (weighted BCE + weighted IoU) over deep-supervision heads.

Replicates the reference's *actual* math (train.py:21-29), including the
documented quirk: the legacy `reduce="none"` kwarg silently resolves to
reduction='mean', so the BCE term is a scalar and the per-pixel weighting
cancels (SURVEY.md §2.1). The intended per-pixel weighted BCE is available
behind `weighted_bce=True`.

Inputs are NHWC logits/masks with one channel; everything is computed in
fp32 regardless of the model compute dtype (loss scale stability)."""

from __future__ import annotations

import jax.numpy as jnp

from sam2unet_tpu.ops.pooling import avg_pool2d_same


def _bce_with_logits(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    # numerically-stable elementwise BCE, matching torch's formulation
    return jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def structure_loss(
    pred: jnp.ndarray,
    mask: jnp.ndarray,
    weighted_bce: bool = False,
) -> jnp.ndarray:
    """pred, mask: (B, H, W, 1). Returns a scalar."""
    pred = pred.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    weit = 1.0 + 5.0 * jnp.abs(avg_pool2d_same(mask, 31) - mask)

    bce = _bce_with_logits(pred, mask)
    if weighted_bce:
        wbce = (weit * bce).sum(axis=(1, 2, 3)) / weit.sum(axis=(1, 2, 3))
    else:
        # reference behavior: scalar mean-BCE; the weit ratio cancels exactly
        wbce = bce.mean()

    p = jnp.asarray(jnp.reciprocal(1.0 + jnp.exp(-pred)))
    inter = (p * mask * weit).sum(axis=(1, 2, 3))
    union = ((p + mask) * weit).sum(axis=(1, 2, 3))
    wiou = 1.0 - (inter + 1.0) / (union - inter + 1.0)
    return (wbce + wiou).mean()


def multi_head_loss(
    preds: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    mask: jnp.ndarray,
    weighted_bce: bool = False,
) -> jnp.ndarray:
    """Sum of structure losses over (out, out1, out2) — train.py:76-79."""
    return sum(structure_loss(p, mask, weighted_bce) for p in preds)
