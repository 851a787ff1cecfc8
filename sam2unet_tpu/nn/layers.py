"""Core flax.linen building blocks (NHWC, fp32 params, configurable compute).

Parity notes (checked against the torch defaults the reference relies on):
  - GELU is the exact erf form (torch nn.GELU default) — flax's default is
    the tanh approximation, so we pin approximate=False.
  - BatchNorm: torch momentum 0.1 == flax momentum 0.9; eps 1e-5. Under a
    data-sharded jit the batch-stat reduction is global automatically (XLA
    inserts the cross-chip psum), so no axis_name is needed.
  - LayerNorm2d (ConvNeXt-style channel norm, sam2_utils.py:137-149) in NHWC
    is just LayerNorm over the trailing axis.
  - Torch `nn.Sequential` integer indices map to `layers_{i}` module names so
    the checkpoint converter has a mechanical rule.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.gelu(x, approximate=False)


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, NO activation.

    Mirrors the reference's BasicConv2d whose forward skips its defined ReLU
    (SAM2UNet.py:83-86) — the quirk is intentional for checkpoint parity.
    """

    features: int
    kernel: tuple[int, int]
    stride: int = 1
    padding: tuple[int, int] = (0, 0)
    dilation: int = 1
    # cross-replica SyncBN axis for shard_map data parallelism (under plain
    # jit/GSPMD leave None: XLA's global batch reduction is automatic)
    bn_axis: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.stride,
            padding=(
                (self.padding[0], self.padding[0]),
                (self.padding[1], self.padding[1]),
            ),
            kernel_dilation=self.dilation,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.bn_axis,
            dtype=self.dtype,
            name="bn",
        )(x)
        return x


class _DenseParams(nn.Module):
    """Parameter-only Dense (kernel/bias leaves match nn.Dense) so fused
    kernels can consume the weights directly."""

    in_features: int
    features: int

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))


class LNParams(nn.Module):
    """Parameter-only LayerNorm (scale/bias leaves match nn.LayerNorm)."""

    features: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))


class MLPParams(nn.Module):
    """Parameter-only 2-layer MLP with the converter's layers_{i} names."""

    in_features: int
    hidden: int
    out_features: int

    def setup(self):
        self.layers_0 = _DenseParams(self.in_features, self.hidden)
        self.layers_1 = _DenseParams(self.hidden, self.out_features)


class SequentialMLPParams(nn.Module):
    """Parameter-only Linear->act->Linear with torch Sequential {0, 2}
    names (the Adapter's prompt_learn tree) — weights for the fused
    adapter kernel path."""

    in_features: int
    dims: Sequence[int]

    def setup(self):
        prev = self.in_features
        for j, d in enumerate(self.dims):
            setattr(self, f"layers_{2 * j}", _DenseParams(prev, d))
            prev = d


class MLP(nn.Module):
    """Stacked Dense with activation on all but the last layer.

    Matches sam2_utils.MLP (sam2_utils.py:108-132); layer i is named
    `layers_{i}` for the converter. With `fused=True` and 2 layers, the
    forward runs the Pallas matmul-gelu-matmul kernel (hidden never touches
    HBM) — same parameter tree, TPU-only (XLA fallback elsewhere).
    """

    hidden_dim: int
    output_dim: int
    num_layers: int
    activation: Callable = nn.relu
    sigmoid_output: bool = False
    fused: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # the fused kernel hardcodes GELU — never reroute another
        # activation through it (silent nonlinearity swap)
        if (self.fused and self.num_layers == 2 and not self.sigmoid_output
                and self.activation in (gelu, nn.gelu)):
            from sam2unet_tpu.ops.pallas.fused_mlp import fused_mlp

            d_in = x.shape[-1]
            p0 = _DenseParams(d_in, self.hidden_dim, name="layers_0")
            p1 = _DenseParams(self.hidden_dim, self.output_dim, name="layers_1")
            return fused_mlp(
                x.astype(self.dtype),
                p0.kernel, p0.bias, p1.kernel, p1.bias,
            )
        dims = [self.hidden_dim] * (self.num_layers - 1) + [self.output_dim]
        for i, d in enumerate(dims):
            x = nn.Dense(d, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = self.activation(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class SequentialMLP(nn.Module):
    """Linear->act->Linear->act chain (the Adapter's prompt_learn shape,
    SAM2UNet.py:57-59). Torch Sequential indices {0, 2} -> layers_{0,2}."""

    dims: Sequence[int]
    activation: Callable = gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j, d in enumerate(self.dims):
            x = nn.Dense(d, dtype=self.dtype, name=f"layers_{2 * j}")(x)
            x = self.activation(x)
        return x


class DropPath(nn.Module):
    """Per-sample stochastic depth (sam2_utils.py:88-103)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        # mask in x.dtype: an f32 mask would promote the bf16 residual
        # stream to f32 for every downstream block (torch drop_path
        # preserves dtype too)
        mask = jnp.floor(
            keep + jax.random.uniform(rng, shape, dtype=jnp.float32)
        ).astype(x.dtype)
        return x / jnp.asarray(keep, x.dtype) * mask


def layer_norm(dtype=jnp.float32, name: str | None = None) -> nn.LayerNorm:
    """LayerNorm with the trunk's eps=1e-6 (hieradet.py:100)."""
    return nn.LayerNorm(epsilon=1e-6, dtype=dtype, name=name)
