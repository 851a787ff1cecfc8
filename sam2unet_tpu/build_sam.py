"""Model factory — the framework's `build_sam2` / predictor builders.

Replaces the reference's Hydra compose+instantiate (sam2/build_sam.py:15-89)
with explicit construction from the config registry; checkpoint loading is
strict (raises on missing/unexpected keys, build_sam.py:79-89 semantics).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from sam2unet_tpu.configs import HieraConfig, hiera_config
from sam2unet_tpu.models.sam2_base import SAM2Base, SAM2Config
from sam2unet_tpu.utils.jax_setup import setup_jax


def build_sam2(
    config_name: str = "sam2_hiera_s",
    ckpt_path: str | None = None,
    *,
    sam2_config: SAM2Config | None = None,
    trunk_cfg: HieraConfig | None = None,
    dtype=None,
    hydra_overrides_extra=(),
    apply_postprocessing: bool = True,
) -> tuple[SAM2Base, dict]:
    """Returns (model, variables).

    config_name is a registry name (`sam2_hiera_s`) or a path to a
    reference-shaped YAML config; `hydra_overrides_extra` takes the
    reference's `++key.path=value` strings (build_sam.py:15-44) and
    `apply_postprocessing` adds the same dynamic-multimask stability
    overrides the reference adds (build_sam.py:25-31). An explicit
    `sam2_config`/`trunk_cfg` dataclass wins over both — the canonical
    jit-static config path."""
    import os

    from sam2unet_tpu.configs import hydra_compat

    setup_jax()
    overrides = list(hydra_overrides_extra)
    if apply_postprocessing:
        overrides += [
            "++model.sam_mask_decoder_extra_args.dynamic_multimask_via_stability=true",
            "++model.sam_mask_decoder_extra_args.dynamic_multimask_stability_delta=0.05",
            "++model.sam_mask_decoder_extra_args.dynamic_multimask_stability_thresh=0.98",
        ]
    if config_name.endswith((".yaml", ".yml")) and os.path.exists(config_name):
        tree = hydra_compat.compose(config_name, overrides)
    else:
        tree = hydra_compat.merge_overrides({}, overrides)
        tree.setdefault("model", {}).setdefault("image_encoder", {})[
            "trunk"
        ] = dataclasses.asdict(hiera_config(config_name))
    yaml_trunk, yaml_cfg = hydra_compat.configs_from_tree(tree)
    trunk = trunk_cfg or yaml_trunk
    cfg = sam2_config or yaml_cfg
    model = SAM2Base(trunk_cfg=trunk, cfg=cfg,
                     dtype=dtype or jnp.float32)

    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)

    def init_all(key, x):
        def run(m: SAM2Base):
            out = m.forward_image(x)
            fpn = out["backbone_fpn"]
            b = x.shape[0]
            coords = jnp.zeros((b, 1, 2), jnp.float32)
            labels = -jnp.ones((b, 1), jnp.int32)
            m.forward_sam_heads(
                fpn[-1], coords, labels, None, (fpn[0], fpn[1]), False
            )
            feats = fpn[-1]
            pos = out["vision_pos_enc"][-1]
            m.condition_features_on_memory(feats, pos, None, None, 0, True)
            # memory spatial tokens must tile the query grid (rope_k_repeat)
            hw = feats.shape[1] * feats.shape[2]
            mem = jnp.zeros((b, hw + 4, cfg.mem_dim), model.dtype)
            m.condition_features_on_memory(feats, pos, mem, mem, 4, False)
            hr = jnp.zeros((b, 1, cfg.image_size, cfg.image_size), jnp.float32)
            m.encode_new_memory(feats, hr, False)
            m.use_mask_as_output(
                fpn[-1], (fpn[0], fpn[1]),
                jnp.zeros((b, cfg.image_size, cfg.image_size, 1), jnp.float32),
            )
            return out

        return model.init(key, method=run)

    variables = jax.jit(init_all)(jax.random.PRNGKey(0), x)
    variables = dict(variables)

    if ckpt_path:
        from flax.core import unfreeze

        from sam2unet_tpu.interop.torch_convert import (
            convert_state_dict,
            load_torch_file,
            validate_against,
        )

        state = load_torch_file(ckpt_path)
        if "model" in state and isinstance(state["model"], dict):
            state = state["model"]
        converted = convert_state_dict(state)
        variables = unfreeze(variables)
        validate_against(variables, converted, scope="sam2 checkpoint")
        variables = converted
    return model, variables


def build_sam2_image_predictor(config_name="sam2_hiera_s", ckpt_path=None, **kw):
    from sam2unet_tpu.predictors.image_predictor import SAM2ImagePredictor

    model, variables = build_sam2(config_name, ckpt_path, **kw)
    return SAM2ImagePredictor(model, variables)


def build_sam2_video_predictor(config_name="sam2_hiera_s", ckpt_path=None, **kw):
    """Video-predictor factory with the reference's video-specific
    postprocessing defaults (sam2/build_sam.py:55-66): binarized memory
    encoding for prompted frames and small-hole filling (area 8) in the
    predicted mask scores, both disabled by apply_postprocessing=False."""
    from sam2unet_tpu.predictors.video_predictor import SAM2VideoPredictor

    overrides = list(kw.pop("hydra_overrides_extra", ()))
    fill_hole_area = kw.pop("fill_hole_area", None)
    if kw.get("apply_postprocessing", True):
        overrides = overrides + [
            "++model.binarize_mask_from_pts_for_mem_enc=true",
        ]
        if fill_hole_area is None:
            fill_hole_area = 8
    model, variables = build_sam2(
        config_name, ckpt_path, hydra_overrides_extra=overrides, **kw
    )
    return SAM2VideoPredictor(model, variables,
                              fill_hole_area=fill_hole_area or 0)
