"""Fused-kernel ops: CPU fallback numerics + padding-fill equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from sam2unet_tpu.ops.pallas.fused_mlp import _xla_mlp, fused_ln_matmul, fused_mlp
from sam2unet_tpu.ops.windowing import (
    window_partition,
    window_partition_fill,
    window_unpartition,
)


def test_fused_mlp_matches_unfused():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((7, 9, 32)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((32, 64)) * 0.1)
    b1 = jnp.asarray(rng.standard_normal(64) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((64, 32)) * 0.1)
    b2 = jnp.asarray(rng.standard_normal(32) * 0.1)
    got = fused_mlp(x, w1, b1, w2, b2)
    ref = _xla_mlp(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_fused_mlp_ln_residual_grads():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((5, 16)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((16, 32)) * 0.1)
    b1 = jnp.zeros(32)
    w2 = jnp.asarray(rng.standard_normal((32, 16)) * 0.1)
    b2 = jnp.zeros(16)
    s = jnp.ones(16)
    b = jnp.zeros(16)

    def f(x, w1, w2):
        return fused_mlp(x, w1, b1, w2, b2, ln_scale=s, ln_bias=b,
                         residual=True).sum()

    def fr(x, w1, w2):
        return _xla_mlp(x, w1, b1, w2, b2, s, b, residual=True).sum()

    g = jax.grad(f, argnums=(0, 1, 2))(x, w1, w2)
    gr = jax.grad(fr, argnums=(0, 1, 2))(x, w1, w2)
    for a, r in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4,
                                   atol=1e-5)


def test_fused_ln_matmul_matches_norm_then_dense():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 6, 6, 24)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((24, 72)) * 0.1)
    b = jnp.asarray(rng.standard_normal(72) * 0.1)
    scale = jnp.asarray(rng.standard_normal(24))
    bias = jnp.asarray(rng.standard_normal(24))
    got = fused_ln_matmul(x, w, b, scale, bias)

    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-6)
    y = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    ref = y @ w + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_partition_fill_equals_project_after_pad():
    """deferred-bias partition of a bias-free projection == the reference's
    partition-then-project ordering (pads carry exactly the bias)."""
    rng = np.random.default_rng(3)
    xn = jnp.asarray(rng.standard_normal((2, 6, 7, 8)), jnp.float32)  # normed
    w = jnp.asarray(rng.standard_normal((8, 12)) * 0.3)
    b = jnp.asarray(rng.standard_normal(12))
    window = 4

    # reference order: partition (zero pad) then project with bias
    xw, pad_hw = window_partition(xn, window)
    ref = xw @ w + b

    # ours: bias-free projection, zero-pad partition, bias added by the
    # consumer (attend's q/k/v slices) — simulate that final add here
    qkv_nobias = xn @ w
    got, pad_hw2 = window_partition_fill(qkv_nobias, window, b)
    assert pad_hw == pad_hw2
    np.testing.assert_allclose(np.asarray(got + b), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # round trip crops back to the bias-free projection on real tokens
    back = window_unpartition(got, window, pad_hw, (6, 7))
    np.testing.assert_allclose(np.asarray(back), np.asarray(qkv_nobias),
                               rtol=1e-5, atol=1e-5)
