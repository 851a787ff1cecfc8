"""Window partition/unpartition as pure reshape/transpose (zero-copy in XLA).

Semantics match the reference's padding rules (sam2/modeling/backbones/
utils.py:16-55): pad bottom/right to a window multiple, partition into
(B*nW, win, win, C), and unpartition back cropping the pad. Under jit all
shapes are static so XLA folds these into the surrounding ops' layouts.
"""

from __future__ import annotations

import functools as _functools

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


def window_partition_valid(
    x: jnp.ndarray, window: int
) -> list[tuple[jnp.ndarray, int]]:
    """Pad-free window partition into up to 4 exact-shape groups.

    The reference (sam2/modeling/backbones/utils.py:16-35) zero-pads the
    grid to a window multiple, wasting up to 2.1x tokens at 352 input.
    Instead, slice the grid into the full-window region plus right/bottom/
    corner remainder strips; each group's windows hold only valid tokens.

    Returns [(windows, n_pad)] where windows is (B*nW, gh, gw, C) and
    n_pad = window**2 - gh*gw is how many identical pad tokens the padded
    partition would have added per window (consumed by the synthetic-pad-key
    attention to reproduce the reference numerics exactly).
    Group order matches window_merge_valid: ff, fr, rf, rr.
    """
    b, h, w, c = x.shape
    nh, rh = divmod(h, window)
    nw, rw = divmod(w, window)

    def part(sub: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
        s = sub.reshape(b, sub.shape[1] // gh, gh, sub.shape[2] // gw, gw, c)
        return s.transpose(0, 1, 3, 2, 4, 5).reshape(-1, gh, gw, c)

    groups = []
    if nh and nw:
        groups.append((part(x[:, : nh * window, : nw * window], window, window), 0))
    if nh and rw:
        groups.append(
            (part(x[:, : nh * window, nw * window :], window, rw),
             window * (window - rw))
        )
    if rh and nw:
        groups.append(
            (part(x[:, nh * window :, : nw * window], rh, window),
             (window - rh) * window)
        )
    if rh and rw:
        groups.append(
            (part(x[:, nh * window :, nw * window :], rh, rw),
             window * window - rh * rw)
        )
    return groups


def window_merge_valid(
    outs: list[jnp.ndarray], b: int, h: int, w: int, window: int
) -> jnp.ndarray:
    """Inverse of window_partition_valid: stitch per-group window outputs
    (same order) back into (B, H, W, C) — no crop needed, nothing was padded."""
    nh, rh = divmod(h, window)
    nw, rw = divmod(w, window)
    it = iter(outs)

    def unpart(wins: jnp.ndarray, gr_h: int, gr_w: int, gh: int, gw: int):
        c = wins.shape[-1]
        x = wins.reshape(b, gr_h // gh, gr_w // gw, gh, gw, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gr_h, gr_w, c)

    rows = []
    top = []
    if nh and nw:
        top.append(unpart(next(it), nh * window, nw * window, window, window))
    if nh and rw:
        top.append(unpart(next(it), nh * window, rw, window, rw))
    if top:
        rows.append(top[0] if len(top) == 1 else jnp.concatenate(top, axis=2))
    bot = []
    if rh and nw:
        bot.append(unpart(next(it), rh, nw * window, rh, window))
    if rh and rw:
        bot.append(unpart(next(it), rh, rw, rh, rw))
    if bot:
        rows.append(bot[0] if len(bot) == 1 else jnp.concatenate(bot, axis=2))
    return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=1)


@_functools.lru_cache(maxsize=64)
def grid_window_mask(h: int, w: int, window: int):
    """Additive mask + pad-key log-multiplicity for whole-grid masked
    window attention over a small (H*W <= ~512 tokens) grid.

    Returns (mask (S, S) f32 with 0 within a window / -1e30 across, and
    logmult (1, S) f32 = ln(n_pad of the query's window), -1e30 when the
    window has no pads) as numpy arrays — the exact whole-grid encoding of
    the reference's zero-padded window attention (utils.py:16-35): the
    n_pad identical bias-valued pad tokens of each window collapse to one
    synthetic key with that log-multiplicity."""
    import numpy as _np

    rows = _np.arange(h)[:, None].repeat(w, 1).reshape(-1)
    cols = _np.arange(w)[None, :].repeat(h, 0).reshape(-1)
    nw_cols = -(-w // window)
    win_id = (rows // window) * nw_cols + (cols // window)
    mask = _np.where(win_id[:, None] == win_id[None, :], 0.0, -1e30)
    counts = _np.bincount(win_id, minlength=win_id.max() + 1)
    n_pad = window * window - counts
    logmult = _np.where(n_pad[win_id] > 0,
                        _np.log(_np.maximum(n_pad[win_id], 1)), -1e30)
    return (mask.astype(_np.float32),
            logmult.astype(_np.float32).reshape(1, -1))


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
