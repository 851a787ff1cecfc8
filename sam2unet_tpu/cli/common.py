"""Shared CLI plumbing: model construction, weight loading, eval loop."""

from __future__ import annotations

import numpy as np

from sam2unet_tpu.configs import SAM2UNetConfig, hiera_config
from sam2unet_tpu.models.sam2unet import SAM2UNet
from sam2unet_tpu.ops.resize_np import resize_np
from sam2unet_tpu.utils.jax_setup import setup_jax


def build_model(
    model_cfg: str = "sam2_hiera_s", dtype=None, remat: bool = False,
    bn_axis: str | None = None,
) -> tuple[SAM2UNet, SAM2UNetConfig]:
    import jax.numpy as jnp

    cfg = SAM2UNetConfig(trunk=hiera_config(model_cfg))
    model = SAM2UNet(cfg, remat=remat, bn_axis=bn_axis,
                     dtype=dtype or jnp.float32)
    return model, cfg


def init_variables(model, size: int, batch: int = 1) -> dict:
    import jax
    import jax.numpy as jnp

    setup_jax()
    x = jnp.zeros((batch, size, size, 3))
    return jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False
    )


def load_weights(
    variables: dict, hiera_path: str = "", checkpoint: str = ""
) -> dict:
    """Reference loading contract: optional SAM2 trunk init (train.py:42),
    then optional strict full-model checkpoint (train.py:45-46)."""
    from flax.core import unfreeze

    from sam2unet_tpu.interop.torch_convert import (
        load_sam2_trunk,
        validate_against,
    )
    from sam2unet_tpu.train.checkpoints import load_any_checkpoint

    variables = unfreeze(variables)
    if hiera_path:
        trunk = load_sam2_trunk(hiera_path)
        for coll, sub in trunk.items():
            validate_against(
                {"encoder": _drop_adapters(variables[coll]["encoder"])},
                sub,
                scope=f"sam2 trunk/{coll}",
            )
            _merge_into(variables[coll], sub)
    if checkpoint:
        loaded = load_any_checkpoint(checkpoint, variables)
        validate_against(variables, loaded, scope="sam2unet checkpoint")
        variables = loaded
    return variables


def _drop_adapters(encoder_tree: dict) -> dict:
    """Remove prompt_learn leaves (absent from official SAM2 trunks)."""
    out = {}
    for k, v in encoder_tree.items():
        if k == "prompt_learn":
            continue
        out[k] = _drop_adapters(v) if isinstance(v, dict) else v
    return out


def _merge_into(dst: dict, src: dict) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge_into(dst[k], v)
        else:
            dst[k] = np.asarray(v)


def postprocess_prediction(
    logits_nhwc: np.ndarray,
    padding: tuple[int, int, int, int],
    size: int,
    gt_shape: tuple[int, int],
) -> np.ndarray:
    """Reference eval/test postprocess (train.py:103-112, test.py:66-76):
    crop letterbox padding -> bilinear resize logits to GT res -> sigmoid ->
    min-max normalize -> uint8."""
    left, top, right, bottom = padding
    res = logits_nhwc[0, top : size - bottom, left : size - right, 0]
    res = resize_np(res[None, None], tuple(gt_shape), "bilinear")[0, 0]
    res = 1.0 / (1.0 + np.exp(-res))
    res = (res - res.min()) / (res.max() - res.min() + 1e-8)
    return (res * 255).astype(np.uint8)
