"""Window partition/unpartition as pure reshape/transpose (zero-copy in XLA).

Semantics match the reference's padding rules (sam2/modeling/backbones/
utils.py:16-55): pad bottom/right to a window multiple, partition into
(B*nW, win, win, C), and unpartition back cropping the pad. Under jit all
shapes are static so XLA folds these into the surrounding ops' layouts.
"""

from __future__ import annotations

import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window: int) -> tuple[jnp.ndarray, tuple[int, int]]:
    """(B, H, W, C) -> (B*nW, win, win, C), plus padded (Hp, Wp)."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_partition_fill(
    x: jnp.ndarray, window: int, fill: jnp.ndarray
) -> tuple[jnp.ndarray, tuple[int, int]]:
    """window_partition of a BIAS-FREE projection, adding `fill` (the
    projection bias, (C,)) to every token AFTER zero-padding: real tokens
    become xW+b and pad tokens exactly b — equal to the reference's
    zero-pad-normed-then-project ordering, with the bias add fused by XLA
    into the partition transpose (no update-slice passes)."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    # NOTE: the caller adds `fill` (deferred projection bias) downstream —
    # fused into the q/k/v slice consumers, not materialized here
    return x, (hp, wp)


def window_unpartition(
    windows: jnp.ndarray, window: int, pad_hw: tuple[int, int], hw: tuple[int, int]
) -> jnp.ndarray:
    """(B*nW, win, win, C) -> (B, H, W, C), cropping the partition pad."""
    hp, wp = pad_hw
    h, w = hw
    c = windows.shape[-1]
    b = windows.shape[0] // ((hp // window) * (wp // window))
    x = windows.reshape(b, hp // window, wp // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    if hp != h or wp != w:
        x = x[:, :h, :w]
    return x
