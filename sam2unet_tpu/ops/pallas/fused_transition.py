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


def transition_bwd_supported(window: int, cout: int, wd: int,
                             cin: int) -> bool:
    """Whether the dx-only Pallas backward fits VMEM for this geometry
    (strip-level estimate; see _tr_bwd). hiera.py consults this under
    TRAIN before taking the fused transition at all: when the Pallas
    backward cannot run, the jax.vjp(_xla_transition) fallback
    materializes the full-resolution transition intermediates at backward
    time — at s@960 stage 1->2 that overflowed HBM by 4 GB — so the
    unfused path (whose backward XLA schedules with its usual remat) is
    the correct train form there."""
    import os

    if os.environ.get("SAM2UNET_DISABLE_TRANSITION_BWD"):
        return False                               # perf-bisect switch
    s = window * window
    if s % 16:
        return False
    n_w = wd // window
    strip_live = (n_w * (8 * s * s + 22 * s * cout)
                  + 4 * window * wd * cin)
    return strip_live <= 8 * 1024 * 1024


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


def _pool2x2_first_match(t, g, hs, width, ch):
    """(g, 2*hs, width, ch) row-pair max + FIRST-MATCH routing masks
    (mirrors lax.reduce_window's select_and_scatter tie convention).
    Returns (pooled (g, hs, width, ch), mask0, mask1) with mask_i the
    indicator that row i of the pair carries the cotangent."""
    tr = t.reshape(g, hs, 2, width, ch)
    m = jnp.max(tr, axis=2)
    # compare in f32: Mosaic has no bf16 cmpf, and bf16->f32 is exact
    m0 = tr[:, :, 0, :, :].astype(jnp.float32) >= m.astype(jnp.float32)
    m1 = jnp.logical_not(m0)
    return m, m0, m1


def _transition_bwd_kernel(x_ref, g_ref, w_ref, b_ref, ln_ref, wp_ref,
                           wsh_ref, bsh_ref, dx_ref, y_buf, gw_buf, mu_buf,
                           r_buf, acc, *, nh: int, nw: int, ws: int,
                           scale: float, resident: bool):
    """dx-only backward of the fused transition block, one strip per grid
    row, heads on the second grid axis (the frozen-trunk case — SAM2-UNet
    hard-freezes the Hiera trunk, so transition blocks never need weight
    grads in training). Recomputes LN/shortcut/qkv/softmax in VMEM from x
    alone; the only HBM traffic is x, the incoming gradient, the weights,
    and dx."""
    h = pl.program_id(1)
    hw = h if resident else 0
    x = x_ref[:]                                   # (gs, ws, W, c_in)
    gs, _, wd, cin = x.shape
    g = gs * nw
    s = ws * ws
    hs = ws // 2
    sq = hs * hs
    cout = wsh_ref.shape[-1]

    @pl.when(h == 0)
    def _():
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        r = jax.lax.rsqrt(var + _LN_EPS)
        y = (xf - mu) * r * ln_ref[0].astype(jnp.float32) \
            + ln_ref[1].astype(jnp.float32)
        yw = y.astype(x.dtype).reshape(gs, ws, nw, ws, cin)
        yw = yw.transpose(0, 2, 1, 3, 4).reshape(g, s, cin)
        y_buf[:] = yw
        muw = mu.reshape(gs, ws, nw, ws, 1).transpose(0, 2, 1, 3, 4)
        mu_buf[:] = muw.reshape(g, s, 1)
        rw = r.reshape(gs, ws, nw, ws, 1).transpose(0, 2, 1, 3, 4)
        r_buf[:] = rw.reshape(g, s, 1)
        # incoming gradient to window order: (gs, hs, nw*hs, cout) ->
        # (g, sq, cout)
        gy = g_ref[:].reshape(gs, hs, nw, hs, cout)
        gw_buf[:] = gy.transpose(0, 2, 1, 3, 4).reshape(g, sq, cout)
        # ---- shortcut backward: unpool g through the 2x2 max of the
        # shortcut Dense, then through the Dense itself ----
        ysh = jax.lax.dot_general(
            y_buf[:].reshape(g * s, cin), wsh_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + bsh_ref[:].astype(jnp.float32)
        ysh = ysh.astype(x.dtype).reshape(g, ws, ws, cout)
        p1, r0, r1 = _pool2x2_first_match(ysh, g, hs, ws, cout)
        p1r = p1.reshape(g, hs, hs, 2, cout)
        m2 = jnp.max(p1r, axis=3)                  # (g, hs, hs, cout)
        c0 = p1r[:, :, :, 0, :].astype(jnp.float32) >= m2.astype(jnp.float32)
        c1 = jnp.logical_not(c0)
        gq = gw_buf[:].astype(jnp.float32).reshape(g, hs, hs, cout)
        # scatter through the column stage then the row stage
        gc = jnp.stack([gq * c0, gq * c1], axis=3).reshape(g, hs, ws, cout)
        gr = jnp.stack([gc * r0, gc * r1], axis=2).reshape(g, ws, ws, cout)
        d_sh = gr.astype(x.dtype).reshape(g * s, cout)
        acc[:] = jax.lax.dot_general(              # @ wsh^T -> (G*S, c_in)
            d_sh, wsh_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(g, s, cin)

    # ---- per-head qkv/attention recompute + backward ----
    y2 = y_buf[:].reshape(g * s, cin)
    qkv = jax.lax.dot_general(
        y2, w_ref[hw], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + b_ref[hw].astype(jnp.float32)).astype(x.dtype)
    d = qkv.shape[-1] // 3
    q = qkv[:, :d].reshape(g, ws, ws, d)
    k = qkv[:, d : 2 * d].reshape(g, s, d)
    v = qkv[:, 2 * d :].reshape(g, s, d)
    q1, qr0, qr1 = _pool2x2_first_match(q, g, hs, ws, d)
    q1r = q1.reshape(g, hs, hs, 2, d)
    qp2 = jnp.max(q1r, axis=3)
    qc0 = q1r[:, :, :, 0, :].astype(jnp.float32) >= qp2.astype(jnp.float32)
    qc1 = jnp.logical_not(qc0)
    qp = qp2.reshape(g, sq, d)

    sc = jax.lax.dot_general(                      # (G, Sq, S) f32
        qp, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(sc, axis=-1, keepdims=True)
    e = jnp.exp(sc - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    gw = gw_buf[:]                                 # (g, sq, cout)
    do = jax.lax.dot_general(                      # g @ Wp^T: (G, Sq, d)
        gw.reshape(g * sq, cout), wp_ref[hw], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(g, sq, d)
    dp = jax.lax.dot_general(                      # (G, Sq, S)
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    pb = p.astype(x.dtype)
    dv = jax.lax.dot_general(                      # p^T do: (G, S, d)
        pb, do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
          * scale).astype(x.dtype)
    dqp = jax.lax.dot_general(                     # (G, Sq, d)
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk = jax.lax.dot_general(                      # ds^T qp: (G, S, d)
        ds, qp, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # unpool dqp through the q-pool argmax masks (col stage, then rows)
    dqg = dqp.reshape(g, hs, hs, d)
    dqc = jnp.stack([dqg * qc0, dqg * qc1], axis=3).reshape(g, hs, ws, d)
    dq = jnp.stack([dqc * qr0, dqc * qr1], axis=2).reshape(g, s, d)

    w3h = w_ref[hw]
    dqf = dq.astype(x.dtype).reshape(g * s, d)
    dkf = dk.astype(x.dtype).reshape(g * s, d)
    dvf = dv.astype(x.dtype).reshape(g * s, d)

    def dotT(a, wslice):                           # a (N, d) @ w^T (c, d)
        return jax.lax.dot_general(
            a, wslice, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dy_h = (dotT(dqf, w3h[:, :d]) + dotT(dkf, w3h[:, d : 2 * d])
            + dotT(dvf, w3h[:, 2 * d :])).reshape(g, s, cin)
    acc[:] = acc[:] + dy_h

    @pl.when(h == nh - 1)
    def _():
        xw = x.reshape(gs, ws, nw, ws, cin).transpose(0, 2, 1, 3, 4)
        xf = xw.reshape(g, s, cin).astype(jnp.float32)
        xhat = (xf - mu_buf[:]) * r_buf[:]
        dxhat = acc[:] * ln_ref[0].astype(jnp.float32)
        mean1 = jnp.mean(dxhat, axis=-1, keepdims=True)
        mean2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = r_buf[:] * (dxhat - mean1 - xhat * mean2)
        db = dx.reshape(gs, nw, ws, ws, cin).transpose(0, 2, 1, 3, 4)
        dx_ref[:] = db.reshape(gs, ws, wd, cin).astype(dx_ref.dtype)


def _transition_bwd_impl(x, g, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
                         w_short, b_short, num_heads, window,
                         interpret=False):
    b, hh, wd, cin = x.shape
    nh = num_heads
    cout = w_proj.shape[-1]
    d = cout // nh
    ws = window
    n_h, n_w = hh // ws, wd // ws
    s = ws * ws
    sq = (ws // 2) * (ws // 2)
    xr = x.reshape(b * n_h, ws, wd, cin)
    gr = g.reshape(b * n_h, ws // 2, wd // 2, cout)
    resident, live_budget = _pick_layout(nh, max(cin, cout), d,
                                         x.dtype.itemsize)
    per_strip = n_w * (s * cin * 8 + s * 3 * d * 6 + 2 * s * cout * 6
                       + sq * cout * 6) + ws * wd * cin * 4
    gs = _pick_strips(b * n_h, per_strip, live_budget)
    g_ = gs * n_w
    w3 = w_qkv.reshape(cin, 3, nh, d).transpose(2, 0, 1, 3).reshape(
        nh, cin, 3 * d)
    b3 = b_qkv.reshape(3, nh, d).transpose(1, 0, 2).reshape(nh, 1, 3 * d)
    wp3 = w_proj.reshape(nh, d, cout)
    ln = jnp.stack([jnp.asarray(ln_scale, x.dtype),
                    jnp.asarray(ln_bias, x.dtype)])
    wspec = _weight_specs(resident, nh)
    dx = pl.pallas_call(
        functools.partial(_transition_bwd_kernel, nh=nh, nw=n_w, ws=ws,
                          scale=1.0 / math.sqrt(d), resident=resident),
        grid=(b * n_h // gs, nh),
        in_specs=[
            pl.BlockSpec((gs, ws, wd, cin), lambda i, h: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gs, ws // 2, wd // 2, cout),
                         lambda i, h: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec(cin, 3 * d),
            wspec(1, 3 * d),
            pl.BlockSpec((2, cin), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            wspec(d, cout),
            pl.BlockSpec((cin, cout), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gs, ws, wd, cin), lambda i, h: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n_h, ws, wd, cin), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g_, s, cin), x.dtype),       # normed y
            pltpu.VMEM((g_, sq, cout), x.dtype),     # g in window order
            pltpu.VMEM((g_, s, 1), jnp.float32),     # LN mu
            pltpu.VMEM((g_, s, 1), jnp.float32),     # LN rsqrt
            pltpu.VMEM((g_, s, cin), jnp.float32),   # dxn accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_h * n_w * s * cin * (6 * cout + 2 * cout)
            + 2 * b * n_h * n_w * nh * sq * s * 4 * d,
            bytes_accessed=(2 * b * hh * wd * cin
                            + b * (hh // 2) * (wd // 2) * cout)
            * x.dtype.itemsize,
            transcendentals=b * n_h * n_w * nh * sq * s,
        ),
        # NO input_output_aliases here: donating x -> dx raised Mosaic's
        # scoped-vmem stack to 17.22M (> 16M) at the @960 stage-1->2
        # geometry — this kernel's strip budget already rides the limit,
        # and the alias bought no measurable time at l@352 (round 5 A/B).
        interpret=interpret,
    )(xr, gr, w3.astype(x.dtype), b3.astype(jnp.float32), ln,
      wp3.astype(x.dtype), w_short.astype(x.dtype),
      b_short.reshape(1, -1).astype(jnp.float32))
    return dx.reshape(b, hh, wd, cin)


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
        # frozen trunk (the fork hard-freezes it): dx only. Same gate as
        # the forward: the strip-I/O Pallas backward recomputes
        # LN/shortcut/qkv/softmax in VMEM from x alone — this is what
        # makes the fused transition a TRAIN win too (the earlier
        # XLA-recompute backward re-materialized the full-resolution
        # qkv/LN tensors the unfused forward would have saved, measured
        # -1.5%; see docs/PERF.md round 4 E2/E6).
        # STRIP-level gate (transition_bwd_supported): the backward
        # kernel holds ALL n_w windows of a full-width strip at once
        # (scores, dq/dk/dv, the f32 dxn accumulator), so the old
        # per-window figure had to scale by n_w plus the strip IO
        # blocks — it let the @960 stage-1->2 geometry (n_w=30) through
        # and Mosaic's scoped-vmem stack hit 17.22M (>16M).
        cout = w_proj.shape[-1]
        zeros = [jnp.zeros_like(t) for t in
                 (w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
                  w_short, b_short)]
        if not (dispatch.xla_only()
                or not transition_bwd_supported(window, cout, x.shape[2],
                                                x.shape[3])):
            dx = _transition_bwd_impl(x, g, w_qkv, b_qkv, ln_scale,
                                      ln_bias, w_proj, w_short, b_short,
                                      num_heads, window)
            return (dx, *zeros)
        _, vjp = jax.vjp(
            lambda xx: _xla_transition(xx, w_qkv, b_qkv, ln_scale, ln_bias,
                                       w_proj, b_proj, w_short, b_short,
                                       num_heads, window),
            x,
        )
        return (vjp(g)[0], *zeros)

    _, vjp = jax.vjp(
        lambda *a: _xla_transition(*a, num_heads, window),
        x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj, w_short,
        b_short,
    )
    return vjp(g)


_fused_transition_vjp.defvjp(_tr_fwd, _tr_bwd)
