"""Position encodings: sine grid, random-Fourier, axial 2-D RoPE.

JAX re-design of sam2/modeling/position_encoding.py:16-216. Complex-number
RoPE is expressed as real (cos, sin) pair rotation (TPU has no complex
MXU path), numerically identical to torch.view_as_complex multiplication.
All generators are shape-static pure functions — the reference's runtime
caching (position_encoding.py:40,80-82) is unnecessary because jit caches
the whole program per shape.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def sine_position_embedding(
    h: int,
    w: int,
    num_pos_feats: int = 256,
    temperature: int = 10000,
    normalize: bool = True,
    scale: float | None = None,
) -> np.ndarray:
    """(H, W, C) sine PE, matching PositionEmbeddingSine.forward
    (position_encoding.py:79-112). Computed in numpy at trace time."""
    assert num_pos_feats % 2 == 0
    half = num_pos_feats // 2
    if scale is None:
        scale = 2 * math.pi
    y = np.arange(1, h + 1, dtype=np.float64)[:, None] * np.ones((1, w))
    x = np.arange(1, w + 1, dtype=np.float64)[None, :] * np.ones((h, 1))
    if normalize:
        eps = 1e-6
        y = y / (y[-1:, :] + eps) * scale
        x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(half, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / half)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[:, :, 0::2]), np.cos(px[:, :, 1::2])], axis=3).reshape(h, w, -1)
    py = np.stack([np.sin(py[:, :, 0::2]), np.cos(py[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return np.concatenate([py, px], axis=2).astype(np.float32)


def get_1d_sine_pe(pos_inds: jnp.ndarray, dim: int, temperature: float = 10000):
    """1-D sine PE for object-pointer time positions (sam2_utils.py:60-70)."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    pos = pos_inds[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=-1)


def random_pe_grid(gaussian: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(H, W, C) random-Fourier PE grid (position_encoding.py:138-149).
    gaussian: (2, num_pos_feats) learned/buffered matrix."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(
        [jnp.tile(xs[None, :], (h, 1)), jnp.tile(ys[:, None], (1, w))], axis=-1
    )
    return random_pe_coords(gaussian, grid)


def random_pe_coords(gaussian: jnp.ndarray, coords01: jnp.ndarray) -> jnp.ndarray:
    """Encode coords normalized to [0,1]; (..., 2) -> (..., 2F)."""
    c = 2.0 * coords01 - 1.0
    c = c @ gaussian
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


# ---------------------------------------------------------------- 2-D RoPE

def axial_rope_cos_sin(
    dim: int, end_x: int, end_y: int, theta: float = 10000.0
) -> tuple[np.ndarray, np.ndarray]:
    """(S, dim//2) cos/sin of the axial frequencies
    (position_encoding.py:167-183); numpy, trace-time constant."""
    quarter = dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4)[:quarter].astype(np.float64) / dim))
    t = np.arange(end_x * end_y, dtype=np.float64)
    tx = t % end_x
    ty = np.floor(t / end_x)
    ax = np.outer(tx, freqs)
    ay = np.outer(ty, freqs)
    ang = np.concatenate([ax, ay], axis=-1)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def apply_rotary(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate adjacent feature pairs of (..., S, D) by (S, D//2) angles."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    a, b = x2[..., 0], x2[..., 1]
    ra = a * cos - b * sin
    rb = a * sin + b * cos
    return jnp.stack([ra, rb], axis=-1).reshape(x.shape).astype(x.dtype)


def apply_rotary_enc(
    xq: jnp.ndarray,
    xk: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    repeat_freqs_k: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate q (and k) like apply_rotary_enc (position_encoding.py:194-216).
    q/k: (B, H, S, D); cos/sin: (Sq, D//2)."""
    xq_out = apply_rotary(xq.astype(jnp.float32), cos, sin).astype(xq.dtype)
    if xk.shape[-2] == 0:
        return xq_out, xk
    if repeat_freqs_k and xk.shape[-2] != xq.shape[-2]:
        r = xk.shape[-2] // xq.shape[-2]
        if r >= 1:
            cos = jnp.tile(cos, (r, 1))
            sin = jnp.tile(sin, (r, 1))
        else:
            # memory shorter than one grid (e.g. the single no-mem token
            # when directly_add_no_mem_embed=False): rotate with the first
            # nk frequency rows — position-0 angles are zero, so a 1-token
            # memory gets the identity rotation. The reference repeats the
            # freqs 0 times here and crashes on the size mismatch.
            cos = cos[: xk.shape[-2]]
            sin = sin[: xk.shape[-2]]
    xk_out = apply_rotary(xk.astype(jnp.float32), cos, sin).astype(xk.dtype)
    return xq_out, xk_out
