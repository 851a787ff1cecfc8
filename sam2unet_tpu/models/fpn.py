"""FPN neck + full image encoder (trunk + neck).

JAX re-design of sam2/modeling/backbones/image_encoder.py:14-133: 1x1
laterals to d_model, top-down interpolated sum on configured levels, sine
PE per level. NHWC; the top-down x2 interpolation honors the config's
fpn_interp_model ('nearest' in all shipped YAMLs, bilinear otherwise).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sam2unet_tpu.configs import HieraConfig
from sam2unet_tpu.models.hiera import Hiera
from sam2unet_tpu.models.position_encoding import sine_position_embedding
from sam2unet_tpu.ops.resize import resize


class FpnNeck(nn.Module):
    d_model: int = 256
    backbone_channel_list: tuple[int, ...] = (768, 384, 192, 96)
    num_pos_feats: int | None = None  # defaults to d_model
    fpn_interp_model: str = "nearest"
    fuse_type: str = "sum"
    fpn_top_down_levels: tuple[int, ...] | None = (2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: list[jnp.ndarray]):
        """xs: trunk outputs fine->coarse (stride 4 first), NHWC.
        Returns (features, pos), both fine->coarse like the reference."""
        n = len(self.backbone_channel_list) - 1
        top_down_levels = (
            tuple(range(n + 1))
            if self.fpn_top_down_levels is None
            else tuple(self.fpn_top_down_levels)
        )
        out: list = [None] * (n + 1)
        pos: list = [None] * (n + 1)
        prev = None
        # top-down: i = n (coarsest input index in reference ordering) .. 0
        # reference indexes xs fine->coarse with i over reversed convs
        for i in range(n, -1, -1):
            x = xs[i]
            lateral = nn.Conv(
                self.d_model, (1, 1), dtype=self.dtype, name=f"convs_{n - i}_conv"
            )(x)
            if i in top_down_levels and prev is not None:
                _, ph, pw, _ = prev.shape
                td = resize(
                    prev.astype(jnp.float32),
                    (2 * ph, 2 * pw),
                    "nearest" if self.fpn_interp_model == "nearest" else "bilinear",
                    align_corners=False,
                ).astype(lateral.dtype)
                prev = lateral + td
                if self.fuse_type == "avg":
                    prev = prev / 2
            else:
                prev = lateral
            out[i] = prev
            npf = self.num_pos_feats or self.d_model
            pe = sine_position_embedding(prev.shape[1], prev.shape[2], npf)
            pos[i] = jnp.broadcast_to(
                jnp.asarray(pe, prev.dtype)[None], prev.shape[:3] + (npf,)
            )
        return out, pos


class ImageEncoder(nn.Module):
    """(image_encoder.py:14-42): trunk -> neck; scalp drops the coarsest
    level(s)."""

    trunk_cfg: HieraConfig
    d_model: int = 256
    scalp: int = 1
    fpn_interp_model: str = "nearest"
    fpn_top_down_levels: tuple[int, ...] = (2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict:
        feats = Hiera(self.trunk_cfg, dtype=self.dtype, name="trunk")(x, train)
        # neck consumes channels coarse->fine per its backbone_channel_list
        chans = tuple(reversed(self.trunk_cfg.channel_list))
        features, pos = FpnNeck(
            d_model=self.d_model,
            backbone_channel_list=chans,
            fpn_interp_model=self.fpn_interp_model,
            fpn_top_down_levels=self.fpn_top_down_levels,
            dtype=self.dtype,
            name="neck",
        )(feats)
        if self.scalp > 0:
            features, pos = features[: -self.scalp], pos[: -self.scalp]
        return {
            "vision_features": features[-1],
            "vision_pos_enc": pos,
            "backbone_fpn": features,
        }
