"""Device-side resize as MXU matmuls (see resize_np.py for the matrices).

`resize(x, size)` operates on NHWC tensors: the H and W axes are contracted
against precomputed (out, in) interpolation matrices, so the whole op is two
einsums that XLA fuses and tiles onto the systolic array — no gathers, no
dynamic shapes, fully differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

from sam2unet_tpu.ops.resize_np import resize_matrix


def resize(
    x: jnp.ndarray,
    size: tuple[int, int],
    method: str = "bilinear",
    align_corners: bool = False,
    antialias: bool = False,
) -> jnp.ndarray:
    """Resize NHWC (or HWC) tensor spatially with torch-exact semantics."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    oh, ow = size
    if (oh, ow) != (h, w):
        dt = x.dtype
        rh = jnp.asarray(resize_matrix(h, oh, method, align_corners, antialias), dt)
        rw = jnp.asarray(resize_matrix(w, ow, method, align_corners, antialias), dt)
        x = jnp.einsum("oh,bhwc->bowc", rh, x)
        x = jnp.einsum("pw,bowc->bopc", rw, x)
    return x[0] if squeeze else x
