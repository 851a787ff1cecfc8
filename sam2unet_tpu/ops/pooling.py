"""Pooling primitives on NHWC tensors via `lax.reduce_window`.

Covers the two pooling uses of the reference: the 2x2 max q-pool at Hiera
stage changes (hieradet.py:110) and the 31x31 stride-1 average pool inside
the structure loss (train.py:22, count_include_pad=True semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def max_pool2d(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """NHWC max pool, no padding (torch ceil_mode=False)."""
    # NOTE: the init value must be a plain scalar literal so JAX recognizes
    # the (max, -inf) monoid and lowers to the differentiable
    # reduce_window_max primitive instead of the generic (non-AD) one.
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = x.dtype.type(-jnp.inf)
    else:
        init = jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def avg_pool2d_same(x: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """NHWC stride-1 average pool with symmetric zero padding.

    Divides by kernel**2 unconditionally — torch's count_include_pad=True,
    as exercised by the structure loss (train.py:22: k=31, s=1, p=15).
    """
    assert kernel % 2 == 1, "same-shape contract needs an odd kernel"
    pad = kernel // 2
    # separable: sum over the k x k rectangle == 1-D row sums then column
    # sums (exact, zero padding) — 2k adds/pixel instead of k^2
    summed = lax.reduce_window(
        x,
        x.dtype.type(0),
        lax.add,
        window_dimensions=(1, kernel, 1, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (0, 0), (0, 0)),
    )
    summed = lax.reduce_window(
        summed,
        x.dtype.type(0),
        lax.add,
        window_dimensions=(1, 1, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (pad, pad), (0, 0)),
    )
    return summed / jnp.asarray(kernel * kernel, x.dtype)
