"""SAM2-UNet: frozen Hiera trunk (adapter-PEFT) + RFB neck + U-Net decoder.

TPU-native re-design of SAM2UNet.py:128-173:
  - Everything NHWC; upsampling is MXU-matmul bilinear (ops/resize) with the
    reference's exact align_corners conventions (Up: True at SAM2UNet.py:35,
    output heads: False at SAM2UNet.py:168-172).
  - The trunk params live under `encoder/` and are frozen by the optimizer
    mask (train/optim.py), mirroring requires_grad=False at SAM2UNet.py:146.
  - The unused 4th decoder stage (`up4`, constructed but never called in the
    reference, SAM2UNet.py:159 vs :167-172) is reproduced for state-dict
    compatibility behind `include_unused_up4`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sam2unet_tpu.configs import SAM2UNetConfig
from sam2unet_tpu.models.hiera import Hiera
from sam2unet_tpu.nn.layers import ConvBN
from sam2unet_tpu.ops.resize import resize


class RFBModified(nn.Module):
    """4-branch receptive field block (SAM2UNet.py:89-125).

    Each branch is a chain of ConvBN (conv+BN, no inner ReLU — faithfully
    reproducing the BasicConv2d.forward quirk); branches concat into a 3x3
    fuse, residual 1x1, final ReLU.
    """

    out_channels: int
    bn_axis: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        oc, dt = self.out_channels, self.dtype

        def conv(name, kernel, padding=(0, 0), dilation=1):
            return ConvBN(oc, kernel, padding=padding, dilation=dilation,
                          bn_axis=self.bn_axis, dtype=dt, name=name)

        b0 = conv("branch0_layers_0", (1, 1))(x, train)

        b1 = conv("branch1_layers_0", (1, 1))(x, train)
        b1 = conv("branch1_layers_1", (1, 3), (0, 1))(b1, train)
        b1 = conv("branch1_layers_2", (3, 1), (1, 0))(b1, train)
        b1 = conv("branch1_layers_3", (3, 3), (3, 3), 3)(b1, train)

        b2 = conv("branch2_layers_0", (1, 1))(x, train)
        b2 = conv("branch2_layers_1", (1, 5), (0, 2))(b2, train)
        b2 = conv("branch2_layers_2", (5, 1), (2, 0))(b2, train)
        b2 = conv("branch2_layers_3", (3, 3), (5, 5), 5)(b2, train)

        b3 = conv("branch3_layers_0", (1, 1))(x, train)
        b3 = conv("branch3_layers_1", (1, 7), (0, 3))(b3, train)
        b3 = conv("branch3_layers_2", (7, 1), (3, 0))(b3, train)
        b3 = conv("branch3_layers_3", (3, 3), (7, 7), 7)(b3, train)

        cat = jnp.concatenate([b0, b1, b2, b3], axis=-1)
        fused = conv("conv_cat", (3, 3), (1, 1))(cat, train)
        res = conv("conv_res", (1, 1))(x, train)
        return nn.relu(fused + res)


class DoubleConv(nn.Module):
    """(conv3x3 no-bias -> BN -> ReLU) x 2 (SAM2UNet.py:9-26).

    Sequential indices: conv0/bn1/relu/conv3/bn4 -> layers_{0,1,3,4}."""

    mid_channels: int
    out_channels: int
    bn_axis: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.mid_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="layers_0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.bn_axis,
                         dtype=self.dtype, name="layers_1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="layers_3")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.bn_axis,
                         dtype=self.dtype, name="layers_4")(x)
        return nn.relu(x)


class Up(nn.Module):
    """Bilinear x2 upsample, center-pad to the skip's grid, concat, DoubleConv
    (SAM2UNet.py:29-49)."""

    in_channels: int
    out_channels: int
    bn_axis: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, train: bool = False):
        _, h1, w1, _ = x1.shape
        x1 = resize(x1, (2 * h1, 2 * w1), "bilinear", align_corners=True)
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        if dh or dw:
            # torch F.pad semantics: negative amounts crop (SAM2UNet.py:44)
            lo_h, hi_h = dh // 2, dh - dh // 2
            lo_w, hi_w = dw // 2, dw - dw // 2
            x1 = jnp.pad(
                x1,
                (
                    (0, 0),
                    (max(lo_h, 0), max(hi_h, 0)),
                    (max(lo_w, 0), max(hi_w, 0)),
                    (0, 0),
                ),
            )
            h, w = x1.shape[1], x1.shape[2]
            x1 = x1[
                :,
                max(-lo_h, 0) : h - max(-hi_h, 0),
                max(-lo_w, 0) : w - max(-hi_w, 0),
                :,
            ]
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.in_channels // 2, self.out_channels,
                          bn_axis=self.bn_axis, dtype=self.dtype,
                          name="conv")(x, train)


class SAM2UNet(nn.Module):
    """Full model; forward returns (out, out1, out2) logits at input res,
    NHWC with one channel (SAM2UNet.py:164-173)."""

    cfg: SAM2UNetConfig = SAM2UNetConfig()
    include_unused_up4: bool = True
    remat: bool = False  # jax.checkpoint per trunk block (bigger batches)
    # SyncBN axis name for shard_map dp (engine.make_train_step
    # use_shard_map=True); None under plain jit/GSPMD
    bn_axis: str | None = None
    # sequence-parallel global attention over a mesh axis inside shard_map
    # (models/hiera.py sp_axis, ops/sp_attention.py)
    sp_axis: str | None = None
    sp_degree: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        c = self.cfg
        feats = Hiera(c.trunk, use_adapters=True, adapter_dim=c.adapter_dim,
                      remat=self.remat, sp_axis=self.sp_axis,
                      sp_degree=self.sp_degree, dtype=self.dtype,
                      name="encoder")(x, train)
        x1, x2, x3, x4 = feats  # strides 4, 8, 16, 32

        ba = self.bn_axis
        x1 = RFBModified(c.rfb_out, ba, self.dtype, name="rfb1")(x1, train)
        x2 = RFBModified(c.rfb_out, ba, self.dtype, name="rfb2")(x2, train)
        x3 = RFBModified(c.rfb_out, ba, self.dtype, name="rfb3")(x3, train)
        x4 = RFBModified(c.rfb_out, ba, self.dtype, name="rfb4")(x4, train)

        d = Up(2 * c.rfb_out, c.rfb_out, ba, self.dtype, name="up1")(x4, x3, train)
        s1 = nn.Conv(1, (1, 1), dtype=self.dtype, name="side1")(d)
        out1 = resize(s1, (16 * s1.shape[1], 16 * s1.shape[2]), "bilinear")

        d = Up(2 * c.rfb_out, c.rfb_out, ba, self.dtype, name="up2")(d, x2, train)
        s2 = nn.Conv(1, (1, 1), dtype=self.dtype, name="side2")(d)
        out2 = resize(s2, (8 * s2.shape[1], 8 * s2.shape[2]), "bilinear")

        d = Up(2 * c.rfb_out, c.rfb_out, ba, self.dtype, name="up3")(d, x1, train)
        if self.include_unused_up4 and self.is_initializing():
            # parity-only params: reference constructs up4 but never calls it,
            # so we materialize its params at init and skip it at apply time
            Up(2 * c.rfb_out, c.rfb_out, ba, self.dtype, name="up4")(d, d, False)
        h = nn.Conv(1, (1, 1), dtype=self.dtype, name="head")(d)
        out = resize(h, (4 * h.shape[1], 4 * h.shape[2]), "bilinear")

        return out, out1, out2
