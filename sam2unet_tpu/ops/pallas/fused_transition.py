"""Fused transition-block kernel: LN -> shortcut Dense+pool -> windowed
QKV -> in-window q-pool -> attention -> proj -> +shortcut, one program.

The q-pool transition blocks (dim-changing first block of stages 2-4,
hieradet.py MultiScaleBlock with q_stride) were the top byte writers in
the round-4 HLO audit (docs/PERF.md): the full-resolution qkv projection
(428.2 / 214.1 MB conv fusions at hiera_l@352 batch 32), its k/v slice +
head-reshape layout copies (4 x 142.7 MB at stage 1-2), and the f32 LN
chains — all materialized to HBM only to be consumed once. This kernel
keeps everything between the raw activations and the pooled block output
in VMEM, using the same strip I/O as fused_window_block_strips: x rides
in as (gs, ws, W, c_in) row strips of the unpartitioned tensor, the
window grouping is an in-VMEM 5-D transpose, and only the 4x-smaller
pooled output (gs, ws/2, W/2, c_out) returns to HBM.

Semantics (exact reference behavior, sam2/modeling/backbones/
hieradet.py:84-167 with q_stride): pre-norm LN; shortcut = 2x2-max-pooled
Dense(dim_out) of the normed input; per 8x8 (or 4x4) window, qkv
projection to dim_out, q max-pooled 2x2 WITHIN the window, softmax
attention of the pooled queries over all window keys, output projection;
residual = shortcut + attention output.

Backward: XLA recompute via jax.vjp of the reference form (`weight_grads`
False differentiates w.r.t. x only — the trunk is frozen in SAM2-UNet).
Divisible even grids only; remainder transitions (hiera_l stage 3->4 at
352: 22x22 grid, window 16) keep the unfused path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sam2unet_tpu.ops.pallas import dispatch
from sam2unet_tpu.ops.pallas.fused_attention_block import (
    _pick_layout,
    _weight_specs,
)

_LN_EPS = 1e-6


def _pool2x2_rows(t, g, hs, width, ch):
    """(g, 2*hs, width, ch) -> (g, hs, width, ch) max over row pairs,
    then the caller pools columns the same way (rank stays <= 5)."""
    return jnp.max(t.reshape(g, hs, 2, width, ch), axis=2)


def _transition_kernel(x_ref, w_ref, b_ref, ln_ref, wp_ref, bp_ref,
                       wsh_ref, bsh_ref, o_ref, y_buf, sc_buf, acc,
                       *, nh: int, nw: int, ws: int, scale: float,
                       resident: bool):
    h = pl.program_id(1)
    hw = h if resident else 0
    x = x_ref[:]                                   # (gs, ws, W, c_in)
    gs, _, wd, cin = x.shape
    g = gs * nw
    s = ws * ws
    hs = ws // 2
    sq = hs * hs

    @pl.when(h == 0)
    def _():
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
        y = y * ln_ref[0].astype(jnp.float32) + ln_ref[1].astype(jnp.float32)
        yw = y.astype(x.dtype).reshape(gs, ws, nw, ws, cin)
        yw = yw.transpose(0, 2, 1, 3, 4).reshape(g, s, cin)
        y_buf[:] = yw
        # shortcut: Dense(dim_out) then 2x2 max-pool, all in window order
        ysh = jax.lax.dot_general(
            yw.reshape(g * s, cin), wsh_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bsh_ref[:].astype(jnp.float32)
        cout = ysh.shape[-1]
        ysh = ysh.astype(x.dtype).reshape(g, ws, ws, cout)
        p1 = _pool2x2_rows(ysh, g, hs, ws, cout)   # (g, hs, ws, cout)
        p2 = jnp.max(p1.reshape(g, hs, hs, 2, cout), axis=3)
        sc_buf[:] = p2.reshape(g, sq, cout).astype(jnp.float32)

    y2 = y_buf[:].reshape(g * s, cin)
    qkv = jax.lax.dot_general(                     # (G*S, 3d) fp32
        y2, w_ref[hw], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + b_ref[hw].astype(jnp.float32)).astype(x.dtype)
    d = qkv.shape[-1] // 3
    q = qkv[:, :d].reshape(g, ws, ws, d)
    k = qkv[:, d : 2 * d].reshape(g, s, d)
    v = qkv[:, 2 * d :].reshape(g, s, d)

    q1 = _pool2x2_rows(q, g, hs, ws, d)            # in-window 2x2 q-pool
    qp = jnp.max(q1.reshape(g, hs, hs, 2, d), axis=3).reshape(g, sq, d)

    sc = jax.lax.dot_general(                      # (G, Sq, S) fp32
        qp, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(sc, axis=-1)
    e = jnp.exp(sc - m[..., None])
    den = jnp.sum(e, axis=-1)
    p = (e / den[..., None]).astype(x.dtype)
    o = jax.lax.dot_general(                       # (G, Sq, d) fp32
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_h = jax.lax.dot_general(                   # (G, Sq, cout) fp32
        o.astype(x.dtype), wp_ref[hw], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(h == 0)
    def _():
        acc[:] = out_h

    @pl.when(h > 0)
    def _():
        acc[:] = acc[:] + out_h

    @pl.when(h == nh - 1)
    def _():
        cout = acc.shape[-1]
        out = acc[:] + bp_ref[:].astype(jnp.float32) + sc_buf[:]
        ob = out.reshape(gs, nw, hs, hs, cout).transpose(0, 2, 1, 3, 4)
        o_ref[:] = ob.reshape(gs, hs, nw * hs, cout).astype(o_ref.dtype)


def _xla_transition(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
                    w_short, b_short, num_heads, window):
    """Reference XLA form on (B, H, W, c_in) -> (B, H/2, W/2, c_out):
    mirrors the unfused MultiScaleBlock q-pool branch (models/hiera.py)
    exactly — used for CPU dispatch, the VJP recompute, and tests."""
    from sam2unet_tpu.ops.attention import sdpa
    from sam2unet_tpu.ops.pooling import max_pool2d
    from sam2unet_tpu.ops.windowing import window_partition, window_unpartition

    b, hh, wd, cin = x.shape
    cout = w_proj.shape[-1]
    d = cout // num_heads
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + _LN_EPS) * ln_scale
          + ln_bias).astype(dt)
    shortcut = jnp.dot(xn, w_short.astype(dt)) + b_short.astype(dt)
    shortcut = max_pool2d(shortcut, 2, 2)
    xw, _ = window_partition(xn, window)           # divisible: no pads
    nw_, wh, ww, _ = xw.shape
    qkv = jnp.dot(xw, w_qkv.astype(dt)) + b_qkv.astype(dt)
    q = qkv[..., :cout]
    k = qkv[..., cout : 2 * cout].reshape(nw_, wh * ww, num_heads, d)
    v = qkv[..., 2 * cout :].reshape(nw_, wh * ww, num_heads, d)
    q = max_pool2d(q, 2, 2)
    hq, wq = q.shape[1], q.shape[2]
    q = q.reshape(nw_, hq * wq, num_heads, d)
    o = sdpa(q, k, v).reshape(nw_, hq, wq, cout)
    o = jnp.dot(o.astype(dt), w_proj.astype(dt)) + b_proj.astype(dt)
    attn = window_unpartition(o, window // 2, (hh // 2, wd // 2),
                              (hh // 2, wd // 2))
    return shortcut + attn


def fused_transition_block(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
                           b_proj, w_short, b_short, num_heads: int,
                           window: int, weight_grads: bool = True):
    """x: (B, H, W, c_in), H/W divisible by an even `window` ->
    (B, H/2, W/2, c_out)."""
    assert window % 2 == 0
    assert x.shape[1] % window == 0 and x.shape[2] % window == 0
    return _fused_transition_vjp(x, w_qkv, b_qkv, ln_scale, ln_bias,
                                 w_proj, b_proj, w_short, b_short,
                                 num_heads, window, weight_grads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _fused_transition_vjp(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
                          b_proj, w_short, b_short, num_heads, window,
                          weight_grads=True):
    s = window * window
    cout = w_proj.shape[-1]
    window_live = 8 * s * s + 22 * s * cout
    if dispatch.xla_only() or window_live > 12 * 1024 * 1024 or s % 16:
        return _xla_transition(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
                               b_proj, w_short, b_short, num_heads, window)
    return _fused_transition_fwd_impl(x, w_qkv, b_qkv, ln_scale, ln_bias,
                                      w_proj, b_proj, w_short, b_short,
                                      num_heads, window)


def _pick_strips(n_strips: int, per_strip_bytes: int,
                 live_budget: int) -> int:
    gs = max(1, min(n_strips, live_budget // max(per_strip_bytes, 1), 64))
    while n_strips % gs:
        gs -= 1
    return max(gs, 1)


def _fused_transition_fwd_impl(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
                               b_proj, w_short, b_short, num_heads, window,
                               interpret=False):
    b, hh, wd, cin = x.shape
    nh = num_heads
    cout = w_proj.shape[-1]
    d = cout // nh
    ws = window
    n_h, n_w = hh // ws, wd // ws
    s = ws * ws
    sq = (ws // 2) * (ws // 2)
    xr = x.reshape(b * n_h, ws, wd, cin)           # free bitcast view
    resident, live_budget = _pick_layout(nh, max(cin, cout), d,
                                         x.dtype.itemsize)
    # live bytes per strip: y_buf + x + qkv f32 + shortcut f32 + sc/acc
    per_strip = n_w * (s * cin * 4 + s * 3 * d * 4 + s * cout * 4
                       + sq * cout * 8) + ws * wd * cin * 4
    gs = _pick_strips(b * n_h, per_strip, live_budget)
    g = gs * n_w
    w3 = w_qkv.reshape(cin, 3, nh, d).transpose(2, 0, 1, 3).reshape(
        nh, cin, 3 * d)
    b3 = b_qkv.reshape(3, nh, d).transpose(1, 0, 2).reshape(nh, 1, 3 * d)
    wp3 = w_proj.reshape(nh, d, cout)
    ln = jnp.stack([jnp.asarray(ln_scale, x.dtype),
                    jnp.asarray(ln_bias, x.dtype)])
    wspec = _weight_specs(resident, nh)
    out = pl.pallas_call(
        functools.partial(_transition_kernel, nh=nh, nw=n_w, ws=ws,
                          scale=1.0 / math.sqrt(d), resident=resident),
        grid=(b * n_h // gs, nh),
        in_specs=[
            pl.BlockSpec((gs, ws, wd, cin), lambda i, h: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec(cin, 3 * d),
            wspec(1, 3 * d),
            pl.BlockSpec((2, cin), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            wspec(d, cout),
            pl.BlockSpec((1, cout), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gs, ws // 2, wd // 2, cout),
                               lambda i, h: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b * n_h, ws // 2, wd // 2, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g, s, cin), x.dtype),      # normed, window order
            pltpu.VMEM((g, sq, cout), jnp.float32),  # pooled shortcut
            pltpu.VMEM((g, sq, cout), jnp.float32),  # proj accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_h * n_w * s * cin * (3 * cout + cout)
            + 2 * b * n_h * n_w * nh * sq * s * 2 * d,
            bytes_accessed=(b * hh * wd * cin
                            + b * (hh // 2) * (wd // 2) * cout)
            * x.dtype.itemsize,
            transcendentals=b * n_h * n_w * nh * sq * s,
        ),
        interpret=interpret,
    )(xr, w3.astype(x.dtype), b3.astype(jnp.float32), ln,
      wp3.astype(x.dtype), b_proj.reshape(1, -1).astype(jnp.float32),
      w_short.astype(x.dtype), b_short.reshape(1, -1).astype(jnp.float32))
    return out.reshape(b, hh // 2, wd // 2, cout)


def _tr_fwd(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj, w_short,
            b_short, num_heads, window, weight_grads=True):
    out = _fused_transition_vjp(x, w_qkv, b_qkv, ln_scale, ln_bias,
                                w_proj, b_proj, w_short, b_short,
                                num_heads, window, weight_grads)
    return out, (x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
                 w_short, b_short)


def _tr_bwd(num_heads, window, weight_grads, res, g):
    (x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj, w_short,
     b_short) = res
    if not weight_grads:
        # frozen trunk (the fork hard-freezes it): differentiate w.r.t. x
        # only — XLA recomputes the reference form and DCEs the weight-grad
        # graph; callers pair with stop_gradient so zeros are exact
        _, vjp = jax.vjp(
            lambda xx: _xla_transition(xx, w_qkv, b_qkv, ln_scale, ln_bias,
                                       w_proj, b_proj, w_short, b_short,
                                       num_heads, window),
            x,
        )
        zeros = [jnp.zeros_like(t) for t in
                 (w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
                  w_short, b_short)]
        return (vjp(g)[0], *zeros)

    _, vjp = jax.vjp(
        lambda *a: _xla_transition(*a, num_heads, window),
        x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj, w_short,
        b_short,
    )
    return vjp(g)


_fused_transition_vjp.defvjp(_tr_fwd, _tr_bwd)
