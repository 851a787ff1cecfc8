"""Whole-attention-block Pallas kernel: LN -> QKV -> window attention
(with optional synthetic pad key) -> output proj -> residual, one program.

This is the stage-3 round-maker (docs/PERF.md): at 352 input the model is
~100% HBM-bandwidth-bound and the bytes live in the qkv tensors, fp32
score/softmax matrices, and the staging copies between them. Fusing the
block keeps everything from the LN to the projected residual in VMEM; per
block the only HBM traffic is x in, y out, and the (small) weights.

Design notes (the round-1 mega-kernel blockers, solved):
  - The caller window-partitions x to (nW, S, c): windows are rows, so the
    kernel never does spatial slicing.
  - Heads ride the GRID, not reshapes: Mosaic cannot split a minor dim
    into (3, heads, 72) and its matmul takes one batch dim, so the grid is
    (window_groups, heads) with per-head weight slices pre-arranged to
    (nh, c, 3d) outside. The x/out blocks revolve only on the window index
    (fetched once; written once), the per-head projection accumulates into
    an f32 VMEM scratch — numerics identical to one full-width proj matmul.
  - The normed activations are computed once per window group (head step 0)
    and stashed in scratch.

The synthetic pad key reproduces the reference's zero-padded windows
exactly (see ops/windowing.py window_partition_valid): pad tokens project
to the qkv bias, so n_pad of them collapse to one key with logit
+ln(n_pad) and value v_bias.

Backward: custom VJP recomputing through the XLA reference form (same
pattern as the other fused kernels).

Reference behavior match: sam2/modeling/backbones/hieradet.py:84-167
(MultiScaleBlock norm1 -> attn -> residual) over utils.py window padding.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from sam2unet_tpu.ops.pallas import dispatch
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6


def _kernel(x_ref, w_ref, b_ref, ln_ref, wp_ref, bp_ref, kvp_ref,
            mask_ref, lm_ref, o_ref, y_buf, acc,
            *, nh: int, n_pad: int, scale: float, residual: bool,
            s_valid: int, masked: bool, resident: bool):
    h = pl.program_id(1)
    # resident=True: weight refs hold ALL heads (constant index maps -> one
    # HBM fetch for the whole grid), sliced per head here. resident=False:
    # classic per-head revolving blocks (used when the full stacks would
    # crowd VMEM), index 0 of a 1-head block.
    hw = h if resident else 0
    x = x_ref[:]                                   # (G, S, c)
    g, s, c = x.shape

    @pl.when(h == 0)
    def _():
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
        y = y * ln_ref[0].astype(jnp.float32) + ln_ref[1].astype(jnp.float32)
        y_buf[:] = y.astype(x.dtype)

    y2 = y_buf[:].reshape(g * s, c)
    qkv = jax.lax.dot_general(                     # (G*S, 3d) fp32
        y2, w_ref[hw], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    b3 = b_ref[hw].astype(jnp.float32)             # (1, 3d)
    qkv = (qkv + b3).astype(x.dtype)
    d = qkv.shape[-1] // 3
    q = qkv[:, :d].reshape(g, s, d)
    k = qkv[:, d : 2 * d].reshape(g, s, d)
    v = qkv[:, 2 * d :].reshape(g, s, d)

    sc = jax.lax.dot_general(                      # (G, S, S) fp32
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    if masked:
        # whole small grids in one call: additive block-diagonal window
        # mask (covers row pads too) + per-query pad-key log-multiplicity
        sc = sc + mask_ref[:][None]
    elif s_valid < s:
        # caller row-padded S up to a relayout-friendly multiple; the pad
        # rows must not act as keys (queries are cropped by the caller)
        col = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 2)
        sc = jnp.where(col < s_valid, sc, -1e30)

    if n_pad or masked:
        kvp = kvp_ref[hw].astype(jnp.float32)[None]  # (1, 2, d), lane-aligned
        k_pad = kvp[:, 0:1, :]                     # (1, 1, d)
        v_pad = kvp[:, 1:2, :]
        sp = jnp.sum(q.astype(jnp.float32) * k_pad, axis=-1) * scale
        if masked:
            sp = sp + lm_ref[:]                    # (G, S) + (1, S)
        else:
            sp = sp + math.log(n_pad)              # (G, S)
        m = jnp.maximum(jnp.max(sc, axis=-1), sp)
        e = jnp.exp(sc - m[..., None])
        ep = jnp.exp(sp - m)
        den = jnp.sum(e, axis=-1) + ep
    else:
        m = jnp.max(sc, axis=-1)
        e = jnp.exp(sc - m[..., None])
        den = jnp.sum(e, axis=-1)

    p = (e / den[..., None]).astype(x.dtype)       # fp32 softmax, cast probs
    o = jax.lax.dot_general(                       # (G, S, d) fp32
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if n_pad or masked:
        o = o + (ep / den)[..., None] * v_pad

    out_h = jax.lax.dot_general(                   # (G*S, c) fp32
        o.astype(x.dtype).reshape(g * s, d), wp_ref[hw],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(g, s, c)

    @pl.when(h == 0)
    def _():
        acc[:] = out_h

    @pl.when(h > 0)
    def _():
        acc[:] = acc[:] + out_h

    @pl.when(h == nh - 1)
    def _():
        out = acc[:] + bp_ref[:].astype(jnp.float32)
        if residual:
            out = out + x.astype(jnp.float32)
        o_ref[:] = out.astype(o_ref.dtype)


# Weight stacks at or below this (as Mosaic actually tiles them) stay
# fully VMEM-resident across the grid: constant index maps -> fetched from
# HBM once per kernel call instead of once per (window-group, head) grid
# step. Hiera's stages 1-3 fit (0.3-3.1 MB padded); stage 4 (c=1152,
# nh=16) tiles to ~12.4 MB — over the cap, so it keeps the revolving
# per-head blocks rather than crowd the ~16 MB VMEM.
_RESIDENT_CAP_BYTES = 11 * 1024 * 1024


def _rup(v: int, q: int) -> int:
    return -(-v // q) * q


def _resident_bytes(nh: int, c: int, d: int, itemsize: int) -> int:
    """VMEM bytes of the all-heads weight stacks as Mosaic tiles them
    ((sublane, lane) quanta: bf16 16x128, f32 8x128 — the head-dim lanes
    of the (c, 3d) qkv slices pad 216 -> 256 etc., a ~25% overhead the
    residency decision must charge). qkv (nh, c, 3d) + proj (nh, d, c);
    biases are negligible."""
    sub = 32 // itemsize
    return nh * itemsize * (_rup(c, sub) * _rup(3 * d, 128)
                            + _rup(d, sub) * _rup(c, 128))


def _pick_group(n_windows: int, s: int, c: int, d: int,
                live_budget: int = 5 * 1024 * 1024,
                resident: bool = False) -> int:
    """Largest divisor of n_windows keeping live VMEM values ~<= the
    budget (x/y/out blocks, qkv + scores values, and — only in the
    revolving layout — the per-group weight broadcasts)."""
    per_window = s * c * 14 + s * s * 8 + (0 if resident else 8 * c * d)
    target = max(1, live_budget // max(per_window, 1))
    g = min(n_windows, target, 128)
    while n_windows % g:
        g -= 1
    return max(g, 1)


def _pick_layout(nh: int, c: int, d: int, itemsize: int,
                 cap: int = _RESIDENT_CAP_BYTES):
    """(resident, live_budget): whether the whole per-head weight stacks
    ride VMEM for the full grid, and the group-size budget left for the
    blocks + live values beside them."""
    rb = _resident_bytes(nh, c, d, itemsize)
    if rb > cap:
        return False, 5 * 1024 * 1024
    return True, min(5 * 1024 * 1024,
                     max(1024 * 1024, 10 * 1024 * 1024 - rb))


def _weight_specs(resident: bool, nh: int):
    """BlockSpec factory for the weight stacks: resident -> all heads,
    constant index map (one HBM fetch per call); revolving -> one head,
    re-fetched per grid step."""
    if resident:
        def wspec(*dims):
            return pl.BlockSpec((nh, *dims),
                                lambda i, h: (0,) * (len(dims) + 1),
                                memory_space=pltpu.VMEM)
    else:
        def wspec(*dims):
            return pl.BlockSpec((1, *dims),
                                lambda i, h: (h,) + (0,) * len(dims),
                                memory_space=pltpu.VMEM)
    return wspec


def _xla_window_block(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
                      num_heads, n_pad=0, residual=True,
                      attn_mask=None, pad_logmult=None):
    """Reference XLA form (CPU fallback, VJP recompute, tests)."""
    from sam2unet_tpu.ops.pallas.flash_attention import (
        _MAX_FULL_SEQ,
        _xla_attention,
        attention_with_padkey,
        flash_attention,
    )

    nw, s, c = x.shape
    d = c // num_heads
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + _LN_EPS) * ln_scale + ln_bias).astype(
        x.dtype
    )
    qkv = jnp.dot(y, w_qkv.astype(x.dtype),
                  preferred_element_type=jnp.float32)
    qkv = (qkv + b_qkv).astype(x.dtype).reshape(nw, s, 3, num_heads, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if attn_mask is not None:
        # whole-grid masked mode: same augmented-softmax algebra as the
        # scalar-n_pad path, parameterized by the per-query log-multiplicity
        b3 = b_qkv.reshape(3, num_heads, d)
        o = attention_with_padkey(q, k, v, b3[1], b3[2],
                                  attn_mask=attn_mask,
                                  pad_logmult=pad_logmult)
    elif n_pad:
        b3 = b_qkv.reshape(3, num_heads, d)
        o = attention_with_padkey(q, k, v, b3[1], b3[2], n_pad)
    elif s > _MAX_FULL_SEQ:
        # the long global-attention blocks this whole-block kernel rejects
        # (3600 tokens at 960 input, 4096 at 1024): the tiled streaming-
        # flash kernels keep the (S, S) f32 score chain out of HBM;
        # flash_attention self-dispatches back to _xla_attention on CPU /
        # under force_xla and when no aligned block divides S
        o = flash_attention(q, k, v)
    else:
        o = _xla_attention(q, k, v)
    o = o.reshape(nw, s, c)
    out = jnp.dot(o, w_proj.astype(x.dtype),
                  preferred_element_type=jnp.float32) + b_proj
    out = out.astype(x.dtype)
    return x + out if residual else out


def fused_window_block(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
                       num_heads: int, n_pad: int = 0,
                       residual: bool = True, weight_grads: bool = True,
                       attn_mask=None, pad_logmult=None):
    """x: (nW, S, c) window rows -> (nW, S, c) attention-block output.

    weight_grads=False declares the block's own parameters frozen (the
    fork freezes the whole trunk, SAM2UNet.py:52-65 requires_grad_(False)):
    the backward then computes ONLY dx — much lighter in VMEM and FLOPs —
    and returns zero weight grads. Callers must pair it with
    stop_gradient on the weights so the semantics hold regardless.

    attn_mask/pad_logmult enable MASKED mode: x is a whole small token grid
    (nW = batch, S = H*W <= ~512 tokens), attn_mask is an additive (S, S)
    block-diagonal window mask, and pad_logmult an additive (1, S)
    per-query log-multiplicity for the synthetic pad key (-1e30 where the
    query's window has no pads). One kernel call replaces the 4 valid-group
    calls and their partition/merge slice traffic."""
    masked = attn_mask is not None
    if not masked:
        attn_mask = jnp.zeros((8, 128), jnp.float32)
        pad_logmult = jnp.zeros((1, 8), jnp.float32)
    return _fused_window_block_vjp(
        x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
        attn_mask, pad_logmult,
        num_heads, n_pad, residual, weight_grads, masked,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def _fused_window_block_vjp(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
                            b_proj, attn_mask, pad_logmult,
                            num_heads, n_pad, residual,
                            weight_grads=True, masked=False):
    nw, s, c = x.shape
    nh = num_heads
    d = c // nh
    # One window's live values (fp32 scores + activations copies) must fit
    # scoped VMEM even at group size 1 — the 4096-token global-attention
    # blocks of SAM2@1024 (hieradet.py global_att_blocks) exceed it by 5x
    # and take the XLA path (caught by scripts/bench_sam2.py, this gate
    # mirrors the backward's)
    s_pad16 = s + (-s) % 16
    window_live = 8 * s_pad16 * s_pad16 + 14 * s_pad16 * c
    if dispatch.xla_only() or window_live > 12 * 1024 * 1024:
        return _xla_window_block(
            x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
            num_heads, n_pad, residual,
            attn_mask if masked else None, pad_logmult if masked else None)
    return _fused_window_block_fwd_impl(
        x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
        attn_mask, pad_logmult, num_heads, n_pad, residual, masked)


def _fused_window_block_fwd_impl(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
                                 b_proj, attn_mask, pad_logmult,
                                 num_heads, n_pad, residual, masked,
                                 interpret=False):
    """The Pallas forward proper (post-dispatch-gate); `interpret=True`
    exercises the kernel on CPU in tests."""
    nw, s, c = x.shape
    nh = num_heads
    d = c // nh
    # Row-pad S to the bf16 sublane quantum: splitting (G*S) back into
    # (G, S) inside the kernel is only a supported relayout for aligned S
    # (S=9 crashes Mosaic). Pad rows are masked out of the keys and their
    # query rows cropped below — exact.
    s_valid = s
    row_pad = (-s) % 16
    if row_pad:
        x = jnp.pad(x, ((0, 0), (0, row_pad), (0, 0)))
        if masked:
            attn_mask = jnp.pad(attn_mask, ((0, row_pad), (0, row_pad)),
                                constant_values=-1e30)
            pad_logmult = jnp.pad(pad_logmult, ((0, 0), (0, row_pad)),
                                  constant_values=-1e30)
        s = s + row_pad
    resident, live_budget = _pick_layout(nh, c, d, x.dtype.itemsize)
    g = _pick_group(nw, s, c, d, live_budget, resident)
    # per-head weight layout: qkv (c, [3, nh, d]) -> (nh, c, 3d);
    # bias (3c,) -> (nh, 1, 3d); proj rows ([nh, d], c) -> (nh, d, c)
    w3 = w_qkv.reshape(c, 3, nh, d).transpose(2, 0, 1, 3).reshape(nh, c, 3 * d)
    b3 = b_qkv.reshape(3, nh, d).transpose(1, 0, 2).reshape(nh, 1, 3 * d)
    wp3 = w_proj.reshape(nh, d, c)
    ln = jnp.stack([jnp.asarray(ln_scale, x.dtype),
                    jnp.asarray(ln_bias, x.dtype)])
    # resident layout rationale: the revolving blocks re-fetch the entire
    # weight set once per window group; profiles show those weight-slice
    # DMAs among the top HLO entries (overlapped, i.e. latency-hidden, but
    # still HBM *bandwidth* in a bandwidth-bound model — docs/PERF.md
    # round 3). Residency removes the bytes; adopt-only-if-wins A/B
    # pending in docs/PERF.md. Stacks over the cap keep revolving.
    wspec = _weight_specs(resident, nh)
    out = pl.pallas_call(
        functools.partial(_kernel, nh=nh, n_pad=n_pad,
                          scale=1.0 / math.sqrt(d), residual=residual,
                          s_valid=s_valid, masked=masked, resident=resident),
        grid=(nw // g, nh),
        in_specs=[
            pl.BlockSpec((g, s, c), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec(c, 3 * d),
            wspec(1, 3 * d),
            pl.BlockSpec((2, c), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            wspec(d, c),
            pl.BlockSpec((1, c), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            wspec(2, d),
            pl.BlockSpec(attn_mask.shape, lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pad_logmult.shape, lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, s, c), lambda i, h: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, s, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g, s, c), x.dtype),        # normed activations
            pltpu.VMEM((g, s, c), jnp.float32),    # proj accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nw * s * (c * 4 * c + nh * s * 2 * d),
            bytes_accessed=2 * nw * s * c * x.dtype.itemsize,
            transcendentals=nw * nh * s * s,
        ),
        interpret=interpret,
    )(x, w3.astype(x.dtype), b3.astype(jnp.float32), ln,
      wp3.astype(x.dtype), b_proj.reshape(1, -1).astype(jnp.float32),
      # (nh, 2, d): per-head [k_pad; v_pad] rows, lane-aligned for the
      # synthetic-pad-key path (zeros, unused, when n_pad == 0)
      b_qkv.reshape(3, nh, d)[1:].transpose(1, 0, 2).astype(jnp.float32),
      attn_mask.astype(jnp.float32), pad_logmult.astype(jnp.float32))
    if row_pad:
        out = out[:, :s_valid]
    return out


def _bwd_kernel(x_ref, g_ref, w_ref, b_ref, ln_ref, wp_ref, kvp_ref,
                mask_ref, lm_ref,
                *refs,
                nh: int, scale: float, residual: bool, s_valid: int,
                wg: bool, masked: bool, resident: bool, n_pad: int = 0):
    if wg:
        (dx_ref, dw_ref, db_ref, dls_ref, dlb_ref, dwp_ref, dbp_ref,
         y_buf, mu_buf, r_buf, dy_acc) = refs
    else:
        dx_ref, y_buf, mu_buf, r_buf, dy_acc = refs
    """Fused backward for the n_pad == 0 case: recomputes LN/qkv/softmax in
    VMEM (no residuals saved beyond x) and emits dx plus all weight grads.
    Grid (windows, heads): x/g blocks revolve on the window index; weight
    grads accumulate in per-head-indexed f32 scratches across the whole
    grid and are written once at the final step."""
    i = pl.program_id(0)
    h = pl.program_id(1)
    n_i = pl.num_programs(0)
    x = x_ref[:]                                   # (G, S, c)
    gy = g_ref[:]                                  # (G, S, c) output grad
    g, s, c = x.shape

    # weight-grad OUTPUT blocks have constant index maps, so their single
    # VMEM buffer persists across the whole grid: accumulate directly into
    # them (no scratch twins — the duplicate buffers blew the VMEM budget)
    if wg:
        @pl.when(jnp.logical_and(i == 0, h == 0))
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)
            db_ref[:] = jnp.zeros_like(db_ref)
            dls_ref[:] = jnp.zeros_like(dls_ref)
            dlb_ref[:] = jnp.zeros_like(dlb_ref)
            dwp_ref[:] = jnp.zeros_like(dwp_ref)
            dbp_ref[:] = jnp.zeros_like(dbp_ref)

    @pl.when(h == 0)
    def _():
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        r = jax.lax.rsqrt(var + _LN_EPS)
        y = (xf - mu) * r
        y = y * ln_ref[0].astype(jnp.float32) + ln_ref[1].astype(jnp.float32)
        y_buf[:] = y.astype(x.dtype)
        mu_buf[:] = mu
        r_buf[:] = r
        if wg:
            gf = gy.astype(jnp.float32)
            dbp_ref[:] = dbp_ref[:] + jnp.sum(gf.reshape(g * s, c), axis=0,
                                              keepdims=True)

    # ---- forward recompute for this head ----
    # resident weight stacks vs revolving per-head blocks: see the forward
    # kernel's note
    hw = h if resident else 0
    w3h = w_ref[hw]                                # (c, 3d)
    y2 = y_buf[:].reshape(g * s, c)
    qkv = jax.lax.dot_general(
        y2, w3h, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + b_ref[hw].astype(jnp.float32)).astype(x.dtype)
    d = qkv.shape[-1] // 3
    q = qkv[:, :d].reshape(g, s, d)
    k = qkv[:, d : 2 * d].reshape(g, s, d)
    v = qkv[:, 2 * d :].reshape(g, s, d)
    sc = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    pad_key = masked or n_pad > 0
    if not masked and s_valid < s:
        col = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 2)
        sc = jnp.where(col < s_valid, sc, -1e30)
    if pad_key:
        if masked:
            sc = sc + mask_ref[:][None]
        kvp = kvp_ref[hw].astype(jnp.float32)[None]  # (1, 2, d)
        k_pad = kvp[:, 0:1, :]
        v_pad = kvp[:, 1:2, :]
        sp = jnp.sum(q.astype(jnp.float32) * k_pad, axis=-1) * scale
        sp = sp + (lm_ref[:] if masked else math.log(n_pad))  # (G, S)
        m = jnp.maximum(jnp.max(sc, axis=-1), sp)[..., None]
        e = jnp.exp(sc - m)
        ep = jnp.exp(sp - m[..., 0])
        den = jnp.sum(e, axis=-1) + ep
        p = e / den[..., None]                     # (G, S, S) fp32
        pp = ep / den                              # (G, S) pad-key prob
    else:
        m = jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)

    # ---- backward ----
    g2 = gy.astype(x.dtype).reshape(g * s, c)
    do = jax.lax.dot_general(                      # dO = g @ WpT: (G*S, d)
        g2, wp_ref[hw], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(g, s, d)
    dp = jax.lax.dot_general(                      # (G, S, S)
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    pb = p.astype(x.dtype)
    dv = jax.lax.dot_general(                      # (G, S_k, d)
        pb, do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if pad_key:
        # augmented-softmax backward: the synthetic pad key participates in
        # the normalizer; its value/key are frozen bias slices (no grads)
        dpp = jnp.sum(do.astype(jnp.float32) * v_pad, axis=-1)   # (G, S)
        t = jnp.sum(dp * p, axis=-1) + dpp * pp                  # (G, S)
        ds = p * (dp - t[..., None]) * scale
        ds_pad = pp * (dpp - t) * scale                          # (G, S)
    else:
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    ds = ds.astype(x.dtype)
    dq = jax.lax.dot_general(                      # (G, S, d)
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if pad_key:
        dq = dq + ds_pad[..., None] * k_pad
    dk = jax.lax.dot_general(                      # ds^T q: (G, S_k, d)
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    dqf = dq.astype(x.dtype).reshape(g * s, d)
    dkf = dk.astype(x.dtype).reshape(g * s, d)
    dvf = dv.astype(x.dtype).reshape(g * s, d)
    wq = w3h[:, :d]
    wk = w3h[:, d : 2 * d]
    wv = w3h[:, 2 * d :]

    def dotT(a, b):                                # a (N, d) @ b^T (c, d)
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dy_h = dotT(dqf, wq) + dotT(dkf, wk) + dotT(dvf, wv)  # (G*S, c)
    dy_h = dy_h.reshape(g, s, c)

    @pl.when(h == 0)
    def _():
        dy_acc[:] = dy_h

    @pl.when(h > 0)
    def _():
        dy_acc[:] = dy_acc[:] + dy_h

    if wg:
        # weight grads, accumulated per head across the whole grid
        yb = y2.astype(x.dtype)

        def dW(dpart):                             # y^T dpart: (c, d)
            return jax.lax.dot_general(
                yb, dpart, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        hq = pl.ds(h, 1)
        dw_ref[hq, 0] = dw_ref[hq, 0] + dW(dqf)[None]
        dw_ref[hq, 1] = dw_ref[hq, 1] + dW(dkf)[None]
        dw_ref[hq, 2] = dw_ref[hq, 2] + dW(dvf)[None]
        # bias grads sum the f32 dq/dk/dv (summing the bf16 dqf casts
        # would round every partial sum to 8 mantissa bits)
        dbs = jnp.concatenate(
            [jnp.sum(t.reshape(g * s, -1), axis=0, keepdims=True)
             for t in (dq, dk, dv)],
            axis=0,
        ).astype(jnp.float32)                      # (3, d) bias grads
        db_ref[hq] = db_ref[hq] + dbs[None]
        ob = jax.lax.dot_general(                  # o = p v: (G, S, d)
            pb, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype).reshape(g * s, d)
        dwp_ref[hq] = dwp_ref[hq] + jax.lax.dot_general(  # o^T g: (d, c)
            ob, g2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[None]

    @pl.when(h == nh - 1)
    def _():
        xf = x.astype(jnp.float32)
        r = r_buf[:]
        xhat = (xf - mu_buf[:]) * r
        dy = dy_acc[:]
        if wg:
            # LN param grads
            dls_ref[:] = dls_ref[:] + jnp.sum(
                (dy * xhat).reshape(g * s, c), axis=0, keepdims=True)
            dlb_ref[:] = dlb_ref[:] + jnp.sum(
                dy.reshape(g * s, c), axis=0, keepdims=True)
        # LN input grad
        dxhat = dy * ln_ref[0].astype(jnp.float32)
        mean1 = jnp.mean(dxhat, axis=-1, keepdims=True)
        mean2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = r * (dxhat - mean1 - xhat * mean2)
        if residual:
            dx = dx + gy.astype(jnp.float32)
        dx_ref[:] = dx.astype(dx_ref.dtype)


def _fused_window_block_bwd_impl(x, gy, w_qkv, b_qkv, ln_scale, ln_bias,
                                 w_proj, num_heads, residual,
                                 weight_grads=True, attn_mask=None,
                                 pad_logmult=None, n_pad=0, interpret=False):
    """Returns (dx, dw_qkv, db_qkv, dln_scale, dln_bias, dw_proj, db_proj).
    With weight_grads=False only dx is computed (frozen-trunk training, the
    fork's semantics) and the rest are None — this dx-only form also covers
    the synthetic-pad-key groups (n_pad > 0) and masked mode, whose pad
    key/value are frozen bias slices. weight_grads=True requires
    n_pad == 0 and unmasked."""
    nw, s, c = x.shape
    nh = num_heads
    d = c // nh
    masked = attn_mask is not None
    s_valid = s
    row_pad = (-s) % 16
    if row_pad:
        x = jnp.pad(x, ((0, 0), (0, row_pad), (0, 0)))
        gy = jnp.pad(gy, ((0, 0), (0, row_pad), (0, 0)))
        if masked:
            attn_mask = jnp.pad(attn_mask, ((0, row_pad), (0, row_pad)),
                                constant_values=-1e30)
            pad_logmult = jnp.pad(pad_logmult, ((0, 0), (0, row_pad)),
                                  constant_values=-1e30)
        s = s + row_pad
    if not masked:
        attn_mask = jnp.zeros((8, 128), jnp.float32)
        pad_logmult = jnp.zeros((1, 8), jnp.float32)
    # with weight grads, the f32 grad accumulators already hold all heads
    # in VMEM (constant-map outputs); the resident weight stacks only join
    # them when small. dx-only carries no accumulators -> bigger cap.
    resident, live_budget = _pick_layout(
        nh, c, d, x.dtype.itemsize,
        cap=(4 if weight_grads else 10) * 1024 * 1024)
    g = max(1, _pick_group(nw, s, c, d, live_budget, resident) // 2)
    while nw % g:                                  # bwd holds more live VMEM
        g -= 1
    w3 = w_qkv.reshape(c, 3, nh, d).transpose(2, 0, 1, 3).reshape(nh, c, 3 * d)
    b3 = b_qkv.reshape(3, nh, d).transpose(1, 0, 2).reshape(nh, 1, 3 * d)
    wp3 = w_proj.reshape(nh, d, c)
    ln = jnp.stack([jnp.asarray(ln_scale, x.dtype),
                    jnp.asarray(ln_bias, x.dtype)])
    f32 = jnp.float32
    wg = weight_grads
    wspec = _weight_specs(resident, nh)
    grad_out_specs = (
        pl.BlockSpec((nh, 3, c, d), lambda i, h: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nh, 3, d), lambda i, h: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nh, d, c), lambda i, h: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
    )
    grad_out_shapes = (
        jax.ShapeDtypeStruct((nh, 3, c, d), f32),
        jax.ShapeDtypeStruct((nh, 3, d), f32),
        jax.ShapeDtypeStruct((1, c), f32),
        jax.ShapeDtypeStruct((1, c), f32),
        jax.ShapeDtypeStruct((nh, d, c), f32),
        jax.ShapeDtypeStruct((1, c), f32),
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, nh=nh, scale=1.0 / math.sqrt(d),
                          residual=residual, s_valid=s_valid, wg=wg,
                          masked=masked, n_pad=n_pad, resident=resident),
        grid=(nw // g, nh),
        in_specs=[
            pl.BlockSpec((g, s, c), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s, c), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # resident or revolving weight stacks (see forward in_specs)
            wspec(c, 3 * d),
            wspec(1, 3 * d),
            pl.BlockSpec((2, c), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            wspec(d, c),
            wspec(2, d),
            pl.BlockSpec(attn_mask.shape, lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pad_logmult.shape, lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((g, s, c), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ) + (grad_out_specs if wg else ()),
        out_shape=(
            jax.ShapeDtypeStruct((nw, s, c), x.dtype),
        ) + (grad_out_shapes if wg else ()),
        scratch_shapes=[
            pltpu.VMEM((g, s, c), x.dtype),        # y (normed)
            pltpu.VMEM((g, s, 1), f32),            # mu
            pltpu.VMEM((g, s, 1), f32),            # rsqrt(var)
            pltpu.VMEM((g, s, c), f32),            # dy accumulator
        ],
        # gy is dead after this call (the cotangent's only consumer) and
        # shares dx's block spec: donate its HBM buffer so XLA drops the
        # separate dx allocation + the copy pair around the custom call
        # (grad-path bytes, docs/PERF.md round 5).
        input_output_aliases=dispatch.io_alias({1: 0}),
        interpret=interpret,
    )(x, gy, w3.astype(x.dtype), b3.astype(f32), ln, wp3.astype(x.dtype),
      b_qkv.reshape(3, nh, d)[1:].transpose(1, 0, 2).astype(f32),
      attn_mask.astype(f32), pad_logmult.astype(f32))
    if not wg:
        dx = outs if not isinstance(outs, (tuple, list)) else outs[0]
        if row_pad:
            dx = dx[:, :s_valid]
        return (dx, None, None, None, None, None, None)
    dx, dw4, db3_, dls, dlb, dwp3, dbp = outs
    if row_pad:
        dx = dx[:, :s_valid]
    dw = dw4.transpose(2, 1, 0, 3).reshape(c, 3 * c).astype(w_qkv.dtype)
    db = db3_.transpose(1, 0, 2).reshape(3 * c).astype(b_qkv.dtype)
    dwp = dwp3.reshape(c, c).astype(w_proj.dtype)
    return (dx, dw, db, dls.reshape(c).astype(ln_scale.dtype),
            dlb.reshape(c).astype(ln_bias.dtype), dwp,
            dbp.reshape(c))


# --------------------------------------------------------------------------
# Strip-I/O variant: the kernel consumes the UNPARTITIONED activations.
#
# The HLO byte audit (scripts/bytes_audit.py, docs/PERF.md round 4) showed
# the window partition/merge around every divisible-grid fused-block call
# materializes two full-activation layout copies per block (71.4 MB each at
# hiera_l@352 stage 1/2, batch 32) — plus the bwd consumes the saved
# PARTITIONED x, keeping a third copy live. This variant takes x as
# (B*nH, ws, W, c) row strips (a free bitcast view of (B, H, W, c)), and
# does the window grouping IN VMEM: one 5-D transpose at the first head
# step and one inverse transpose at the last. HBM sees only the raw
# activations, in and out; the residual saved for backward is the raw x.
# Divisible grids only (H % ws == 0 == W % ws): remainder grids keep the
# valid-group path.
# --------------------------------------------------------------------------


def _strip_kernel(x_ref, w_ref, b_ref, ln_ref, wp_ref, bp_ref, o_ref,
                  y_buf, acc,
                  *, nh: int, nw: int, ws: int, scale: float,
                  residual: bool, resident: bool):
    h = pl.program_id(1)
    hw = h if resident else 0
    x = x_ref[:]                                   # (gs, ws, W, c)
    gs, _, wd, c = x.shape
    g = gs * nw
    s = ws * ws

    @pl.when(h == 0)
    def _():
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
        y = y * ln_ref[0].astype(jnp.float32) + ln_ref[1].astype(jnp.float32)
        yw = y.astype(x.dtype).reshape(gs, ws, nw, ws, c)
        y_buf[:] = yw.transpose(0, 2, 1, 3, 4).reshape(g, s, c)

    y2 = y_buf[:].reshape(g * s, c)
    qkv = jax.lax.dot_general(                     # (G*S, 3d) fp32
        y2, w_ref[hw], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + b_ref[hw].astype(jnp.float32)).astype(x.dtype)
    d = qkv.shape[-1] // 3
    q = qkv[:, :d].reshape(g, s, d)
    k = qkv[:, d : 2 * d].reshape(g, s, d)
    v = qkv[:, 2 * d :].reshape(g, s, d)

    sc = jax.lax.dot_general(                      # (G, S, S) fp32
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(sc, axis=-1)
    e = jnp.exp(sc - m[..., None])
    den = jnp.sum(e, axis=-1)
    p = (e / den[..., None]).astype(x.dtype)
    o = jax.lax.dot_general(                       # (G, S, d) fp32
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_h = jax.lax.dot_general(                   # (G*S, c) fp32
        o.astype(x.dtype).reshape(g * s, d), wp_ref[hw],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(g, s, c)

    @pl.when(h == 0)
    def _():
        acc[:] = out_h

    @pl.when(h > 0)
    def _():
        acc[:] = acc[:] + out_h

    @pl.when(h == nh - 1)
    def _():
        out = acc[:] + bp_ref[:].astype(jnp.float32)
        ob = out.reshape(gs, nw, ws, ws, c).transpose(0, 2, 1, 3, 4)
        ob = ob.reshape(gs, ws, wd, c)
        if residual:
            ob = ob + x.astype(jnp.float32)
        o_ref[:] = ob.astype(o_ref.dtype)


def _strip_bwd_kernel(x_ref, g_ref, w_ref, b_ref, ln_ref, wp_ref, dx_ref,
                      y_buf, gy_buf, mu_buf, r_buf, dy_acc,
                      *, nh: int, nw: int, ws: int, scale: float,
                      residual: bool, resident: bool):
    """dx-only backward (frozen trunk): recompute LN/qkv/softmax in VMEM
    from the RAW strip x, accumulate dy over heads in window order, then
    inverse-transpose once and finish the LN backward in strip order."""
    h = pl.program_id(1)
    hw = h if resident else 0
    x = x_ref[:]                                   # (gs, ws, W, c)
    gy = g_ref[:]
    gs, _, wd, c = x.shape
    g = gs * nw
    s = ws * ws

    @pl.when(h == 0)
    def _():
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        r = jax.lax.rsqrt(var + _LN_EPS)
        y = (xf - mu) * r
        y = y * ln_ref[0].astype(jnp.float32) + ln_ref[1].astype(jnp.float32)
        yw = y.astype(x.dtype).reshape(gs, ws, nw, ws, c)
        y_buf[:] = yw.transpose(0, 2, 1, 3, 4).reshape(g, s, c)
        gw = gy.reshape(gs, ws, nw, ws, c)
        gy_buf[:] = gw.transpose(0, 2, 1, 3, 4).reshape(g, s, c)
        mu_buf[:] = mu
        r_buf[:] = r

    # ---- forward recompute for this head (window order) ----
    w3h = w_ref[hw]
    y2 = y_buf[:].reshape(g * s, c)
    qkv = jax.lax.dot_general(
        y2, w3h, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + b_ref[hw].astype(jnp.float32)).astype(x.dtype)
    d = qkv.shape[-1] // 3
    q = qkv[:, :d].reshape(g, s, d)
    k = qkv[:, d : 2 * d].reshape(g, s, d)
    v = qkv[:, 2 * d :].reshape(g, s, d)
    sc = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    m = jnp.max(sc, axis=-1, keepdims=True)
    e = jnp.exp(sc - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    # ---- backward (window order) ----
    g2 = gy_buf[:].reshape(g * s, c)
    do = jax.lax.dot_general(
        g2, wp_ref[hw], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(g, s, d)
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale).astype(
        x.dtype
    )
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dv = jax.lax.dot_general(
        p.astype(x.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dqf = dq.astype(x.dtype).reshape(g * s, d)
    dkf = dk.astype(x.dtype).reshape(g * s, d)
    dvf = dv.astype(x.dtype).reshape(g * s, d)
    wq = w3h[:, :d]
    wk = w3h[:, d : 2 * d]
    wv = w3h[:, 2 * d :]

    def dotT(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dy_h = (dotT(dqf, wq) + dotT(dkf, wk) + dotT(dvf, wv)).reshape(g, s, c)

    @pl.when(h == 0)
    def _():
        dy_acc[:] = dy_h

    @pl.when(h > 0)
    def _():
        dy_acc[:] = dy_acc[:] + dy_h

    @pl.when(h == nh - 1)
    def _():
        dyw = dy_acc[:].reshape(gs, nw, ws, ws, c).transpose(0, 2, 1, 3, 4)
        dy = dyw.reshape(gs, ws, wd, c)            # strip order, f32
        xf = x.astype(jnp.float32)
        r = r_buf[:]
        xhat = (xf - mu_buf[:]) * r
        dxhat = dy * ln_ref[0].astype(jnp.float32)
        mean1 = jnp.mean(dxhat, axis=-1, keepdims=True)
        mean2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = r * (dxhat - mean1 - xhat * mean2)
        if residual:
            dx = dx + gy.astype(jnp.float32)
        dx_ref[:] = dx.astype(dx_ref.dtype)


def _pick_strips(n_strips: int, nw: int, s: int, c: int, d: int,
                 live_budget: int, resident: bool) -> int:
    """Largest divisor of n_strips whose g = gs*nw windows keep live VMEM
    values within the budget (same accounting as _pick_group, plus the
    strip-order x/out blocks and gy/y scratches)."""
    per_window = s * c * 18 + s * s * 8 + (0 if resident else 8 * c * d)
    target = max(1, live_budget // max(per_window * nw, 1))
    gs = min(n_strips, target, 64)
    while n_strips % gs:
        gs -= 1
    return max(gs, 1)


def _xla_strips(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
                num_heads, window, residual):
    """Reference form on (B, H, W, c): partition -> XLA block ->
    unpartition (exact for divisible grids; no pads)."""
    from sam2unet_tpu.ops.windowing import window_partition, window_unpartition

    b, hh, wd, c = x.shape
    xw, pad_hw = window_partition(x, window)
    nw_, wh, ww, _ = xw.shape
    o = _xla_window_block(
        xw.reshape(nw_, wh * ww, c), w_qkv, b_qkv, ln_scale, ln_bias,
        w_proj, b_proj, num_heads, 0, residual,
    )
    return window_unpartition(o.reshape(nw_, wh, ww, c), window,
                              pad_hw, (hh, wd))


def fused_window_block_strips(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
                              b_proj, num_heads: int, window: int,
                              residual: bool = True,
                              weight_grads: bool = True):
    """x: (B, H, W, c), any grid -> same shape.

    Equivalent to window_partition -> fused_window_block -> unpartition,
    but the partition/merge never touches HBM (docs/PERF.md round 4).
    Divisible 16-aligned grids take the original strip kernel; remainder
    or 16-unaligned geometries take the remainder-strip kernel (in-VMEM
    zero pads + alignment key mask — docs/PERF.md round 5); anything the
    gates reject falls back to the exact XLA padded-window form."""
    return _fused_strips_vjp(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
                             b_proj, num_heads, window, residual,
                             weight_grads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _fused_strips_vjp(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
                      num_heads, window, residual, weight_grads=True):
    b, hh, wd, c = x.shape
    s = window * window
    d = c // num_heads
    s_pad16 = s + (-s) % 16
    window_live = 8 * s_pad16 * s_pad16 + 14 * s_pad16 * c
    divisible = hh % window == 0 and wd % window == 0
    if not dispatch.xla_only():
        if (divisible and s % 16 == 0
                and window_live <= 12 * 1024 * 1024):
            return _fused_strips_fwd_impl(x, w_qkv, b_qkv, ln_scale,
                                          ln_bias, w_proj, b_proj,
                                          num_heads, window, residual)
        if strips_rem_supported(hh, wd, window, c, num_heads,
                                x.dtype.itemsize):
            return _fused_strips_rem_fwd_impl(x, w_qkv, b_qkv, ln_scale,
                                              ln_bias, w_proj, b_proj,
                                              num_heads, window, residual)
    xla_form = _xla_strips if divisible else _xla_strips_rem
    return xla_form(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
                    b_proj, num_heads, window, residual)


def _fused_strips_fwd_impl(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
                           b_proj, num_heads, window, residual,
                           interpret=False):
    b, hh, wd, c = x.shape
    nh_heads = num_heads
    d = c // nh_heads
    ws = window
    n_h, n_w = hh // ws, wd // ws
    s = ws * ws
    xr = x.reshape(b * n_h, ws, wd, c)             # free bitcast view
    resident, live_budget = _pick_layout(nh_heads, c, d, x.dtype.itemsize)
    gs = _pick_strips(b * n_h, n_w, s, c, d, live_budget, resident)
    w3 = w_qkv.reshape(c, 3, nh_heads, d).transpose(2, 0, 1, 3).reshape(
        nh_heads, c, 3 * d)
    b3 = b_qkv.reshape(3, nh_heads, d).transpose(1, 0, 2).reshape(
        nh_heads, 1, 3 * d)
    wp3 = w_proj.reshape(nh_heads, d, c)
    ln = jnp.stack([jnp.asarray(ln_scale, x.dtype),
                    jnp.asarray(ln_bias, x.dtype)])
    wspec = _weight_specs(resident, nh_heads)
    g = gs * n_w
    out = pl.pallas_call(
        functools.partial(_strip_kernel, nh=nh_heads, nw=n_w, ws=ws,
                          scale=1.0 / math.sqrt(d), residual=residual,
                          resident=resident),
        grid=(b * n_h // gs, nh_heads),
        in_specs=[
            pl.BlockSpec((gs, ws, wd, c), lambda i, h: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec(c, 3 * d),
            wspec(1, 3 * d),
            pl.BlockSpec((2, c), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            wspec(d, c),
            pl.BlockSpec((1, c), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gs, ws, wd, c), lambda i, h: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g, s, c), x.dtype),        # normed, window order
            pltpu.VMEM((g, s, c), jnp.float32),    # proj accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * (b * n_h * n_w) * s * (c * 4 * c + nh_heads * s * 2 * d),
            bytes_accessed=2 * b * hh * wd * c * x.dtype.itemsize,
            transcendentals=b * n_h * n_w * nh_heads * s * s,
        ),
        interpret=interpret,
    )(xr, w3.astype(x.dtype), b3.astype(jnp.float32), ln,
      wp3.astype(x.dtype), b_proj.reshape(1, -1).astype(jnp.float32))
    return out.reshape(b, hh, wd, c)


def _fused_strips_bwd_impl(x, gy, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
                           num_heads, window, residual, interpret=False):
    """dx-only Pallas backward on raw strips (frozen trunk)."""
    b, hh, wd, c = x.shape
    nh_heads = num_heads
    d = c // nh_heads
    ws = window
    n_h, n_w = hh // ws, wd // ws
    s = ws * ws
    xr = x.reshape(b * n_h, ws, wd, c)
    gr = gy.reshape(b * n_h, ws, wd, c)
    resident, live_budget = _pick_layout(nh_heads, c, d, x.dtype.itemsize,
                                         cap=10 * 1024 * 1024)
    gs = max(1, _pick_strips(b * n_h, n_w, s, c, d, live_budget,
                             resident) // 2)
    while (b * n_h) % gs:
        gs -= 1
    g = gs * n_w
    w3 = w_qkv.reshape(c, 3, nh_heads, d).transpose(2, 0, 1, 3).reshape(
        nh_heads, c, 3 * d)
    b3 = b_qkv.reshape(3, nh_heads, d).transpose(1, 0, 2).reshape(
        nh_heads, 1, 3 * d)
    wp3 = w_proj.reshape(nh_heads, d, c)
    ln = jnp.stack([jnp.asarray(ln_scale, x.dtype),
                    jnp.asarray(ln_bias, x.dtype)])
    wspec = _weight_specs(resident, nh_heads)
    f32 = jnp.float32
    dx = pl.pallas_call(
        functools.partial(_strip_bwd_kernel, nh=nh_heads, nw=n_w, ws=ws,
                          scale=1.0 / math.sqrt(d), residual=residual,
                          resident=resident),
        grid=(b * n_h // gs, nh_heads),
        in_specs=[
            pl.BlockSpec((gs, ws, wd, c), lambda i, h: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gs, ws, wd, c), lambda i, h: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec(c, 3 * d),
            wspec(1, 3 * d),
            pl.BlockSpec((2, c), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            wspec(d, c),
        ],
        out_specs=pl.BlockSpec((gs, ws, wd, c), lambda i, h: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g, s, c), x.dtype),        # y (normed, window order)
            pltpu.VMEM((g, s, c), x.dtype),        # gy (window order)
            pltpu.VMEM((gs, ws, wd, 1), f32),      # mu (strip order)
            pltpu.VMEM((gs, ws, wd, 1), f32),      # rsqrt(var)
            pltpu.VMEM((g, s, c), f32),            # dy accumulator
        ],
        input_output_aliases=dispatch.io_alias({1: 0}),               # donate gy -> dx
        interpret=interpret,
    )(xr, gr, w3.astype(x.dtype), b3.astype(f32), ln, wp3.astype(x.dtype))
    return dx.reshape(b, hh, wd, c)


# --------------------------------------------------------------------------
# Remainder-geometry strip variant: grids where H % ws != 0, W % ws != 0, or
# ws*ws % 16 != 0 — the geometries the divisible strip kernel rejects.
#
# This is the reference fork's shipped operating point (hiera_s@960 stage 3
# runs a 60x60 grid with window 14; /root/reference/train.py:203-204 +
# SAM2UNet.py:131) and also the headline config's stages 3-4 (hiera_l@352:
# 22x22 w16, 11x11 w8), which round 4 left on the partitioned valid-group
# path — whose partition/merge slice copies are the largest remaining
# write category in the byte audit (docs/PERF.md round 4, layout-copy +
# slice/concat rows).
#
# Mechanics: x stays (B, H, W, c) in HBM; blocks are (gb, ws, wg*ws, c)
# edge-overrunning tiles on a cdiv grid (Pallas masks OOB stores; OOB
# loads are garbage and get zeroed in-kernel). Inside VMEM:
#   - LN, then zero all tokens past the true (H, W) bounds. The reference
#     zero-pads AFTER norm1 (hieradet.py window_partition of the normed x),
#     so post-LN zeros ARE the reference pad tokens — they project to the
#     qkv bias and participate as keys exactly like the padded path. No
#     synthetic-key algebra needed; numerics are exact by construction.
#   - window split + pad each window to (hp, wp) with hp*wp % 16 == 0 (the
#     Mosaic (G*S)->(G,S) relayout needs 16-aligned S). These ALIGNMENT
#     pads are additively masked out of the keys (-1e30, a static constant
#     row) — unlike the reference pads, they must not enter the softmax.
#   - dense per-head attention, proj, head accumulation — same layout as
#     the divisible strip kernel — then inverse transpose, crop to (ws,
#     valid W), residual, store (OOB rows/cols masked off by Pallas).
# --------------------------------------------------------------------------


def _xla_strips_rem(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
                    num_heads, window, residual):
    """Exact XLA reference for REMAINDER grids (CPU fallback, VJP
    recompute, tests): valid-window groups + synthetic pad key. NOTE
    _xla_strips is NOT usable here — it partitions the RAW x, so its pad
    tokens go through the in-block LN and become ln_bias-valued, whereas
    the torch reference pads AFTER norm1 (hieradet.py:140-143): pad
    tokens are zero in normed space and project to the qkv bias. The
    valid-group pad-key algebra encodes exactly that."""
    from sam2unet_tpu.ops.windowing import (
        window_merge_valid,
        window_partition_valid,
    )

    b, hh, wd, c = x.shape
    outs = []
    for g, n_pad in window_partition_valid(x, window):
        nw_, gh, gw, _ = g.shape
        o = _xla_window_block(g.reshape(nw_, gh * gw, c), w_qkv, b_qkv,
                              ln_scale, ln_bias, w_proj, b_proj,
                              num_heads, n_pad, residual)
        outs.append(o.reshape(nw_, gh, gw, c))
    return window_merge_valid(outs, b, hh, wd, window)


def _win_pad_dims(ws: int) -> tuple[int, int]:
    """Smallest (hp, wp) >= (ws, ws) with hp*wp % 16 == 0, minimizing the
    padded token count (ties: smaller hp+wp, then smaller hp). ws=14 ->
    (14, 16) [224 tokens], ws=7 -> (8, 8) [64], ws=16 -> (16, 16)."""
    best = None
    for hp in range(ws, ws + 16):
        for wp in range(ws, ws + 16):
            if (hp * wp) % 16:
                continue
            key = (hp * wp, hp + wp, hp)
            if best is None or key < best[0]:
                best = (key, (hp, wp))
    return best[1]


def _rem_key_mask(n_w: int, ws: int, hp: int, wp: int) -> "np.ndarray":
    """Static additive key mask (1, hp*wp) for the alignment pads: 0 where
    the token's within-window (row, col) < ws, else -1e30. The reference's
    own zero pads (beyond the true H/W) are NOT masked — they are real
    keys, zeroed post-LN in the kernel."""
    import numpy as np

    t = np.arange(hp * wp)
    ok = ((t // wp) < ws) & ((t % wp) < ws)
    return np.where(ok, 0.0, -1e30).astype(np.float32)[None]


def _rem_window_order(y, gb, ws, wg, hp, wp, c):
    """(gb, ws, W, c) VMEM value (W <= wg*ws: the block spans the FULL
    array width — the only always-legal Mosaic block geometry when wd is
    not 8-aligned) -> (gb*wg, hp*wp, c) window order. Zero-pads the strip
    width to wg*ws (those are the reference's own post-LN zero pads: real
    attention keys) and each window to the aligned (hp, wp) shape (masked
    off the keys via the static alignment mask)."""
    w_full = wg * ws
    if w_full > y.shape[2]:
        y = jnp.concatenate(
            [y, jnp.zeros((gb, ws, w_full - y.shape[2], c), y.dtype)],
            axis=2)
    yw = y.reshape(gb, ws, wg, ws, c)
    if wp > ws:
        yw = jnp.concatenate(
            [yw, jnp.zeros((gb, ws, wg, wp - ws, c), yw.dtype)], axis=3)
    if hp > ws:
        yw = jnp.concatenate(
            [yw, jnp.zeros((gb, hp - ws, wg, wp, c), yw.dtype)], axis=1)
    return yw.transpose(0, 2, 1, 3, 4).reshape(gb * wg, hp * wp, c)


def _rem_strip_order(o, gb, ws, wg, hp, wp, c, wd):
    """Inverse of _rem_window_order: (gb*wg, hp*wp, c) -> (gb, ws, wd, c),
    cropping the alignment pads and the strip-width pads."""
    o5 = o.reshape(gb, wg, hp, wp, c)[:, :, :ws, :ws, :]
    out = o5.transpose(0, 2, 1, 3, 4).reshape(gb, ws, wg * ws, c)
    return out[:, :, :wd, :]


def _rem_valid_mask(vh, vw, ws: int, wcols: int):
    """(1, ws, wcols, 1) bool: token within the true (H, W) bounds. vh/vw
    are traced per-block scalars (edge strips overrun the array). Built
    directly in 4-D: Mosaic cannot reshape i1 vectors to insert minor
    dims (only 32-bit types), so the broadcast shape comes from the
    iotas, not from [None, ..., None] on a 2-D mask."""
    row = jax.lax.broadcasted_iota(jnp.int32, (1, ws, wcols, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, ws, wcols, 1), 2)
    return (row < vh) & (col < vw)


def _strip_rem_kernel(x_ref, w_ref, b_ref, ln_ref, wp_ref, bp_ref, km_ref,
                      o_ref, y_buf, acc,
                      *, nh: int, ws: int, wg: int, hp: int, wp_: int,
                      hh: int, scale: float, residual: bool,
                      resident: bool):
    i = pl.program_id(1)
    h = pl.program_id(2)
    hw = h if resident else 0
    x = x_ref[:]                                   # (gb, ws, wd, c)
    gb, _, wcols, c = x.shape                      # wcols == wd (full width)
    g = gb * wg
    s = hp * wp_
    vh = jnp.minimum(ws, hh - i * ws)              # valid rows this strip
    vw = wcols                                     # full-width block

    @pl.when(h == 0)
    def _():
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
        y = y * ln_ref[0].astype(jnp.float32) + ln_ref[1].astype(jnp.float32)
        # zero everything past the true bounds: kills the OOB-load garbage
        # AND materializes the reference's post-LN zero pads in one select
        ok = _rem_valid_mask(vh, vw, ws, wcols)
        y = jnp.where(ok, y, 0.0).astype(x.dtype)
        y_buf[:] = _rem_window_order(y, gb, ws, wg, hp, wp_, c)

    y2 = y_buf[:].reshape(g * s, c)
    qkv = jax.lax.dot_general(                     # (G*S, 3d) fp32
        y2, w_ref[hw], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + b_ref[hw].astype(jnp.float32)).astype(x.dtype)
    d = qkv.shape[-1] // 3
    q = qkv[:, :d].reshape(g, s, d)
    k = qkv[:, d : 2 * d].reshape(g, s, d)
    v = qkv[:, 2 * d :].reshape(g, s, d)

    sc = jax.lax.dot_general(                      # (G, S, S) fp32
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    sc = sc + km_ref[:][None]                      # alignment pads off keys
    m = jnp.max(sc, axis=-1)
    e = jnp.exp(sc - m[..., None])
    den = jnp.sum(e, axis=-1)
    p = (e / den[..., None]).astype(x.dtype)
    o = jax.lax.dot_general(                       # (G, S, d) fp32
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_h = jax.lax.dot_general(                   # (G*S, c) fp32
        o.astype(x.dtype).reshape(g * s, d), wp_ref[hw],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(g, s, c)

    @pl.when(h == 0)
    def _():
        acc[:] = out_h

    @pl.when(h > 0)
    def _():
        acc[:] = acc[:] + out_h

    @pl.when(h == nh - 1)
    def _():
        out = acc[:] + bp_ref[:].astype(jnp.float32)
        ob = _rem_strip_order(out, gb, ws, wg, hp, wp_, c, wcols)
        if residual:
            ob = ob + x.astype(jnp.float32)        # OOB garbage rows
        o_ref[:] = ob.astype(o_ref.dtype)          # are masked off the store


def _strip_rem_bwd_kernel(x_ref, g_ref, w_ref, b_ref, ln_ref, wp_ref,
                          km_ref, dx_ref,
                          y_buf, gy_buf, mu_buf, r_buf, dy_acc,
                          *, nh: int, ws: int, wg: int, hp: int, wp_: int,
                          hh: int, scale: float, residual: bool,
                          resident: bool):
    """dx-only backward (frozen trunk) for the remainder geometry: same
    recompute-in-VMEM structure as _strip_bwd_kernel plus the pad/crop
    machinery. Cotangents of the pad tokens (reference zeros AND alignment
    pads) are computed and then cropped — exactly the vjp of the padded
    reference form, whose pad slots are x-independent."""
    i = pl.program_id(1)
    h = pl.program_id(2)
    hw = h if resident else 0
    x = x_ref[:]                                   # (gb, ws, wd, c)
    gy = g_ref[:]
    gb, _, wcols, c = x.shape                      # wcols == wd (full width)
    g = gb * wg
    s = hp * wp_
    vh = jnp.minimum(ws, hh - i * ws)
    vw = wcols                                     # full-width block

    @pl.when(h == 0)
    def _():
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        r = jax.lax.rsqrt(var + _LN_EPS)
        y = (xf - mu) * r
        y = y * ln_ref[0].astype(jnp.float32) + ln_ref[1].astype(jnp.float32)
        ok = _rem_valid_mask(vh, vw, ws, wcols)
        y = jnp.where(ok, y, 0.0).astype(x.dtype)
        y_buf[:] = _rem_window_order(y, gb, ws, wg, hp, wp_, c)
        gz = jnp.where(ok, gy.astype(jnp.float32), 0.0).astype(x.dtype)
        gy_buf[:] = _rem_window_order(gz, gb, ws, wg, hp, wp_, c)
        mu_buf[:] = mu
        r_buf[:] = r

    # ---- forward recompute for this head (window order) ----
    w3h = w_ref[hw]
    y2 = y_buf[:].reshape(g * s, c)
    qkv = jax.lax.dot_general(
        y2, w3h, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + b_ref[hw].astype(jnp.float32)).astype(x.dtype)
    d = qkv.shape[-1] // 3
    q = qkv[:, :d].reshape(g, s, d)
    k = qkv[:, d : 2 * d].reshape(g, s, d)
    v = qkv[:, 2 * d :].reshape(g, s, d)
    sc = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    sc = sc + km_ref[:][None]
    m = jnp.max(sc, axis=-1, keepdims=True)
    e = jnp.exp(sc - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    # ---- backward (window order) ----
    g2 = gy_buf[:].reshape(g * s, c)
    do = jax.lax.dot_general(
        g2, wp_ref[hw], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(g, s, d)
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale).astype(
        x.dtype
    )
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dv = jax.lax.dot_general(
        p.astype(x.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dqf = dq.astype(x.dtype).reshape(g * s, d)
    dkf = dk.astype(x.dtype).reshape(g * s, d)
    dvf = dv.astype(x.dtype).reshape(g * s, d)
    wq = w3h[:, :d]
    wk = w3h[:, d : 2 * d]
    wv = w3h[:, 2 * d :]

    def dotT(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dy_h = (dotT(dqf, wq) + dotT(dkf, wk) + dotT(dvf, wv)).reshape(g, s, c)

    @pl.when(h == 0)
    def _():
        dy_acc[:] = dy_h

    @pl.when(h > 0)
    def _():
        dy_acc[:] = dy_acc[:] + dy_h

    @pl.when(h == nh - 1)
    def _():
        dy = _rem_strip_order(dy_acc[:], gb, ws, wg, hp, wp_, c, wcols)
        # pad-token cotangents are cropped above; the surviving ones feed
        # the LN backward only where the token is real (pads were zeroed
        # post-LN, so d(pad)/dx == 0 — enforce it before the LN chain)
        ok = _rem_valid_mask(vh, vw, ws, wcols)
        dy = jnp.where(ok, dy, 0.0)
        xf = x.astype(jnp.float32)
        r = r_buf[:]
        xhat = (xf - mu_buf[:]) * r
        dxhat = dy * ln_ref[0].astype(jnp.float32)
        mean1 = jnp.mean(dxhat, axis=-1, keepdims=True)
        mean2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = r * (dxhat - mean1 - xhat * mean2)
        if residual:
            dx = dx + gy.astype(jnp.float32)
        dx_ref[:] = dx.astype(dx_ref.dtype)


_REM_VMEM_CAP = 13 * 1024 * 1024


def _rem_vmem_est(gb: int, n_w: int, s: int, c: int, d: int, ws: int,
                  wd: int, itemsize: int, wbytes: int, bwd: bool) -> int:
    """Live-VMEM estimate for one rem-strip grid step: the block spans the
    FULL width (the only always-legal Mosaic geometry for non-8-aligned
    wd), so every window of the strip is live at once — no wg tiling
    freedom. Terms: persistent scratch, per-head matmul/softmax
    transients, double-buffered IO blocks, weight stacks."""
    g = gb * n_w
    est = g * s * c * (itemsize + 4)               # y_buf + acc/dy_acc
    est += g * s * 3 * d * (4 + itemsize)          # qkv f32 + bf16 cast
    est += g * s * s * (8 + itemsize)              # scores f32 x2 + p
    est += g * s * c * 4                           # out_h / dy_h
    n_io = 3 if bwd else 2
    est += 2 * n_io * gb * ws * wd * c * itemsize  # double-buffered blocks
    est += wbytes
    if bwd:
        est += g * s * c * itemsize                # gy_buf
        est += g * s * s * 4                       # dp
        est += 3 * g * s * d * (4 + itemsize)      # dq/dk/dv + casts
        est += 2 * gb * ws * _rup(wd, 128) * 4     # mu/r (lane-padded)
    return est


def _rem_weight_bytes(nh: int, c: int, d: int, itemsize: int,
                      resident: bool) -> int:
    if resident:
        return _resident_bytes(nh, c, d, itemsize)
    return 2 * (c * 3 * d + d * c) * itemsize      # one head, double-buf


def _pick_rem_gb(b: int, n_w: int, s_tok: int, c: int, d: int, ws: int,
                 wd: int, itemsize: int, nh: int, resident: bool,
                 bwd: bool = False) -> int:
    """Largest divisor of b whose full-width strip block fits the cap."""
    wb = _rem_weight_bytes(nh, c, d, itemsize, resident)
    gb = max(1, b)
    while gb > 1 and (b % gb or _rem_vmem_est(gb, n_w, s_tok, c, d, ws, wd,
                                              itemsize, wb, bwd)
                      > _REM_VMEM_CAP):
        gb -= 1
    return gb


def strips_rem_supported(hh: int, wd: int, window: int, c: int,
                         num_heads: int, itemsize: int = 2,
                         bwd: bool = False) -> bool:
    """Whether the remainder-strip kernel engages for this geometry: the
    minimal (gb=1) full-width strip block must fit the VMEM cap.
    SAM2UNET_DISABLE_REM_STRIPS=1 forces the valid-group partitioned path
    (the pre-round-5 behavior) for same-session perf A/Bs."""
    import os

    if os.environ.get("SAM2UNET_DISABLE_REM_STRIPS"):
        return False
    if window <= 0:
        return False
    hp, wp = _win_pad_dims(window)
    s_tok = hp * wp
    d = c // num_heads
    n_w = -(-wd // window)
    # Strip residency caps per-step MXU batching at gb*n_w windows (the
    # whole strip's scratch stays live), while the valid-group partitioned
    # path batches all same-shape windows of the whole batch into one
    # kernel. Measured at hiera_l@352 (stage 3/4: n_w=2): rem strips LOSE
    # 20%/17% (271.61/99.32 vs 337.98/119.63 img/s same-session,
    # docs/PERF.md round 5) — small-n_w geometries belong to the
    # partitioned path.
    if n_w < 4:
        return False
    resident, _ = _pick_layout(num_heads, c, d, itemsize)
    wb = _rem_weight_bytes(num_heads, c, d, itemsize, resident)
    if _rem_vmem_est(1, n_w, s_tok, c, d, window, wd, itemsize, wb,
                     bwd) <= _REM_VMEM_CAP:
        return True
    # the backward has a second regime: window-as-grid-axis (one window's
    # transients live at a time) for strips too big to hold whole
    return bwd and _rem_vmem_est_jw(n_w, s_tok, c, d, window, wd,
                                    itemsize, wb) <= _REM_VMEM_CAP


def _fused_strips_rem_fwd_impl(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
                               b_proj, num_heads, window, residual,
                               interpret=False):
    b, hh, wd, c = x.shape
    nh_heads = num_heads
    d = c // nh_heads
    ws = window
    hp, wp = _win_pad_dims(ws)
    s_tok = hp * wp
    n_h = -(-hh // ws)
    n_w = -(-wd // ws)
    resident, _ = _pick_layout(nh_heads, c, d, x.dtype.itemsize)
    wg = n_w                                       # full-width strips
    gb = _pick_rem_gb(b, n_w, s_tok, c, d, ws, wd, x.dtype.itemsize,
                      nh_heads, resident)
    w3 = w_qkv.reshape(c, 3, nh_heads, d).transpose(2, 0, 1, 3).reshape(
        nh_heads, c, 3 * d)
    b3 = b_qkv.reshape(3, nh_heads, d).transpose(1, 0, 2).reshape(
        nh_heads, 1, 3 * d)
    wp3 = w_proj.reshape(nh_heads, d, c)
    ln = jnp.stack([jnp.asarray(ln_scale, x.dtype),
                    jnp.asarray(ln_bias, x.dtype)])
    km = jnp.asarray(_rem_key_mask(n_w, ws, hp, wp))

    def wspec(*dims):
        if resident:
            return pl.BlockSpec((nh_heads, *dims),
                                lambda ib, i, h: (0,) * (len(dims) + 1),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, *dims),
                            lambda ib, i, h: (h,) + (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda ib, i, h: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    # full-width block: dim 2 == wd is always Mosaic-legal (the 8-aligned
    # wg*ws tilings are NOT when wd itself is unaligned — the width pad to
    # wg*ws happens in VMEM instead)
    xspec = pl.BlockSpec((gb, ws, wd, c),
                         lambda ib, i, h: (ib, i, 0, 0),
                         memory_space=pltpu.VMEM)
    g = gb * wg
    out = pl.pallas_call(
        functools.partial(_strip_rem_kernel, nh=nh_heads, ws=ws, wg=wg,
                          hp=hp, wp_=wp, hh=hh,
                          scale=1.0 / math.sqrt(d), residual=residual,
                          resident=resident),
        grid=(b // gb, n_h, nh_heads),
        in_specs=[
            xspec,
            wspec(c, 3 * d),
            wspec(1, 3 * d),
            cspec((2, c)),
            wspec(d, c),
            cspec((1, c)),
            cspec(km.shape),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g, s_tok, c), x.dtype),    # normed, window order
            pltpu.VMEM((g, s_tok, c), jnp.float32),  # proj accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * (b * n_h * n_w) * s_tok
            * (c * 4 * c + nh_heads * s_tok * 2 * d),
            bytes_accessed=2 * b * hh * wd * c * x.dtype.itemsize,
            transcendentals=b * n_h * n_w * nh_heads * s_tok * s_tok,
        ),
        interpret=interpret,
    )(x, w3.astype(x.dtype), b3.astype(jnp.float32), ln,
      wp3.astype(x.dtype), b_proj.reshape(1, -1).astype(jnp.float32), km)
    return out


def _fused_strips_rem_bwd_impl(x, gy, w_qkv, b_qkv, ln_scale, ln_bias,
                               w_proj, num_heads, window, residual,
                               interpret=False):
    """dx-only Pallas backward for the remainder geometry (frozen trunk)."""
    b, hh, wd, c = x.shape
    nh_heads = num_heads
    d = c // nh_heads
    ws = window
    hp, wp = _win_pad_dims(ws)
    s_tok = hp * wp
    n_h = -(-hh // ws)
    n_w = -(-wd // ws)
    resident, _ = _pick_layout(nh_heads, c, d, x.dtype.itemsize)
    wb = _rem_weight_bytes(nh_heads, c, d, x.dtype.itemsize, resident)
    if _rem_vmem_est(1, n_w, s_tok, c, d, ws, wd, x.dtype.itemsize, wb,
                     True) > _REM_VMEM_CAP:
        # all-windows working set too big (s@960 stage 3): one window's
        # transients per grid step instead
        return _fused_strips_rem_bwd_jw_impl(x, gy, w_qkv, b_qkv, ln_scale,
                                             ln_bias, w_proj, num_heads,
                                             window, residual,
                                             interpret=interpret)
    wg = n_w                                       # full-width strips
    gb = _pick_rem_gb(b, n_w, s_tok, c, d, ws, wd, x.dtype.itemsize,
                      nh_heads, resident, bwd=True)
    w3 = w_qkv.reshape(c, 3, nh_heads, d).transpose(2, 0, 1, 3).reshape(
        nh_heads, c, 3 * d)
    b3 = b_qkv.reshape(3, nh_heads, d).transpose(1, 0, 2).reshape(
        nh_heads, 1, 3 * d)
    wp3 = w_proj.reshape(nh_heads, d, c)
    ln = jnp.stack([jnp.asarray(ln_scale, x.dtype),
                    jnp.asarray(ln_bias, x.dtype)])
    km = jnp.asarray(_rem_key_mask(n_w, ws, hp, wp))
    f32 = jnp.float32

    def wspec(*dims):
        if resident:
            return pl.BlockSpec((nh_heads, *dims),
                                lambda ib, i, h: (0,) * (len(dims) + 1),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, *dims),
                            lambda ib, i, h: (h,) + (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda ib, i, h: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    xspec = pl.BlockSpec((gb, ws, wd, c),
                         lambda ib, i, h: (ib, i, 0, 0),
                         memory_space=pltpu.VMEM)
    g = gb * wg
    dx = pl.pallas_call(
        functools.partial(_strip_rem_bwd_kernel, nh=nh_heads, ws=ws, wg=wg,
                          hp=hp, wp_=wp, hh=hh,
                          scale=1.0 / math.sqrt(d), residual=residual,
                          resident=resident),
        grid=(b // gb, n_h, nh_heads),
        in_specs=[
            xspec,
            xspec,
            wspec(c, 3 * d),
            wspec(1, 3 * d),
            cspec((2, c)),
            wspec(d, c),
            cspec(km.shape),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((g, s_tok, c), x.dtype),    # y (window order)
            pltpu.VMEM((g, s_tok, c), x.dtype),    # gy (window order)
            pltpu.VMEM((gb, ws, wd, 1), f32),      # mu (strip order)
            pltpu.VMEM((gb, ws, wd, 1), f32),      # rsqrt(var)
            pltpu.VMEM((g, s_tok, c), f32),        # dy accumulator
        ],
        input_output_aliases=dispatch.io_alias({1: 0}),               # donate gy -> dx
        interpret=interpret,
    )(x, gy, w3.astype(x.dtype), b3.astype(f32), ln, wp3.astype(x.dtype),
      km)
    return dx


def _strip_rem_bwd_kernel_jw(x_ref, g_ref, w_ref, b_ref, ln_ref, wp_ref,
                             km_ref, dx_ref,
                             y_buf, gy_buf, mu_buf, r_buf, dy_acc,
                             *, nh: int, ws: int, wg: int, hp: int,
                             wp_: int, hh: int, scale: float,
                             residual: bool, resident: bool):
    """dx-only rem backward with the WINDOW as a grid axis: only one
    window's attention transients are live per step, so strips whose
    all-windows working set exceeds VMEM (hiera_s@960 stage 3: 5 windows
    of S=224 -> 17 MiB monolithic) still run fused. The full-strip
    scratch (y/gy in window order, LN stats, the dy accumulator)
    persists across the (j, h) steps of a strip; gb is pinned to 1."""
    i = pl.program_id(1)
    j = pl.program_id(2)
    h = pl.program_id(3)
    hw = h if resident else 0
    x = x_ref[:]                                   # (1, ws, wd, c)
    gy = g_ref[:]
    gb, _, wcols, c = x.shape
    s = hp * wp_
    vh = jnp.minimum(ws, hh - i * ws)
    vw = wcols

    @pl.when((j == 0) & (h == 0))
    def _():
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        r = jax.lax.rsqrt(var + _LN_EPS)
        y = (xf - mu) * r
        y = y * ln_ref[0].astype(jnp.float32) + ln_ref[1].astype(jnp.float32)
        ok = _rem_valid_mask(vh, vw, ws, wcols)
        y = jnp.where(ok, y, 0.0).astype(x.dtype)
        y_buf[:] = _rem_window_order(y, gb, ws, wg, hp, wp_, c)
        gz = jnp.where(ok, gy.astype(jnp.float32), 0.0).astype(x.dtype)
        gy_buf[:] = _rem_window_order(gz, gb, ws, wg, hp, wp_, c)
        mu_buf[:] = mu
        r_buf[:] = r

    # ---- forward recompute, window j, head h ----
    w3h = w_ref[hw]
    yj = y_buf[j]                                  # (s, c)
    qkv = jax.lax.dot_general(
        yj, w3h, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + b_ref[hw].astype(jnp.float32)).astype(x.dtype)
    d = qkv.shape[-1] // 3
    q = qkv[:, :d]
    k = qkv[:, d : 2 * d]
    v = qkv[:, 2 * d :]
    sc = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    sc = sc + km_ref[:]                            # (1, s) over rows
    m = jnp.max(sc, axis=-1, keepdims=True)
    e = jnp.exp(sc - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    # ---- backward, window j, head h ----
    gj = gy_buf[j]                                 # (s, c)
    do = jax.lax.dot_general(
        gj, wp_ref[hw], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)                              # (s, d)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale).astype(
        x.dtype
    )
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv = jax.lax.dot_general(
        p.astype(x.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dqf = dq.astype(x.dtype)
    dkf = dk.astype(x.dtype)
    dvf = dv.astype(x.dtype)

    def dotT(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dy_h = (dotT(dqf, w3h[:, :d]) + dotT(dkf, w3h[:, d : 2 * d])
            + dotT(dvf, w3h[:, 2 * d :]))          # (s, c)

    @pl.when(h == 0)
    def _():
        dy_acc[j] = dy_h

    @pl.when(h > 0)
    def _():
        dy_acc[j] = dy_acc[j] + dy_h

    @pl.when((j == wg - 1) & (h == nh - 1))
    def _():
        dy = _rem_strip_order(dy_acc[:], gb, ws, wg, hp, wp_, c, wcols)
        ok = _rem_valid_mask(vh, vw, ws, wcols)
        dy = jnp.where(ok, dy, 0.0)
        xf = x.astype(jnp.float32)
        r = r_buf[:]
        xhat = (xf - mu_buf[:]) * r
        dxhat = dy * ln_ref[0].astype(jnp.float32)
        mean1 = jnp.mean(dxhat, axis=-1, keepdims=True)
        mean2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = r * (dxhat - mean1 - xhat * mean2)
        if residual:
            dx = dx + gy.astype(jnp.float32)
        dx_ref[:] = dx.astype(dx_ref.dtype)


def _fused_strips_rem_bwd_jw_impl(x, gy, w_qkv, b_qkv, ln_scale, ln_bias,
                                  w_proj, num_heads, window, residual,
                                  interpret=False):
    b, hh, wd, c = x.shape
    nh_heads = num_heads
    d = c // nh_heads
    ws = window
    hp, wp = _win_pad_dims(ws)
    s_tok = hp * wp
    n_h = -(-hh // ws)
    n_w = -(-wd // ws)
    resident, _ = _pick_layout(nh_heads, c, d, x.dtype.itemsize)
    w3 = w_qkv.reshape(c, 3, nh_heads, d).transpose(2, 0, 1, 3).reshape(
        nh_heads, c, 3 * d)
    b3 = b_qkv.reshape(3, nh_heads, d).transpose(1, 0, 2).reshape(
        nh_heads, 1, 3 * d)
    wp3 = w_proj.reshape(nh_heads, d, c)
    ln = jnp.stack([jnp.asarray(ln_scale, x.dtype),
                    jnp.asarray(ln_bias, x.dtype)])
    km = jnp.asarray(_rem_key_mask(n_w, ws, hp, wp))
    f32 = jnp.float32

    def wspec(*dims):
        if resident:
            return pl.BlockSpec((nh_heads, *dims),
                                lambda ib, i, j, h: (0,) * (len(dims) + 1),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, *dims),
                            lambda ib, i, j, h: (h,) + (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda ib, i, j, h: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    xspec = pl.BlockSpec((1, ws, wd, c),
                         lambda ib, i, j, h: (ib, i, 0, 0),
                         memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        functools.partial(_strip_rem_bwd_kernel_jw, nh=nh_heads, ws=ws,
                          wg=n_w, hp=hp, wp_=wp, hh=hh,
                          scale=1.0 / math.sqrt(d), residual=residual,
                          resident=resident),
        grid=(b, n_h, n_w, nh_heads),
        in_specs=[
            xspec,
            xspec,
            wspec(c, 3 * d),
            wspec(1, 3 * d),
            cspec((2, c)),
            wspec(d, c),
            cspec(km.shape),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_w, s_tok, c), x.dtype),  # y (window order)
            pltpu.VMEM((n_w, s_tok, c), x.dtype),  # gy (window order)
            pltpu.VMEM((1, ws, wd, 1), f32),       # mu (strip order)
            pltpu.VMEM((1, ws, wd, 1), f32),       # rsqrt(var)
            pltpu.VMEM((n_w, s_tok, c), f32),      # dy accumulator
        ],
        input_output_aliases=dispatch.io_alias({1: 0}),               # donate gy -> dx
        interpret=interpret,
    )(x, gy, w3.astype(x.dtype), b3.astype(f32), ln, wp3.astype(x.dtype),
      km)
    return dx


def _rem_vmem_est_jw(n_w: int, s: int, c: int, d: int, ws: int, wd: int,
                     itemsize: int, wbytes: int) -> int:
    """Live-VMEM estimate for one jw-variant grid step (gb = 1): the
    full-strip scratch plus ONE window's transients."""
    est = n_w * s * c * (2 * itemsize + 4)         # y_buf + gy_buf + dy_acc
    est += s * 3 * d * (4 + itemsize)              # qkv f32 + cast
    est += s * s * (12 + itemsize)                 # sc/e f32 + dp + p
    est += 3 * s * d * (4 + itemsize)              # dq/dk/dv + casts
    est += s * c * 4                               # dy_h
    est += 2 * 3 * ws * wd * c * itemsize          # x/gy/dx double-buffered
    est += 2 * ws * _rup(wd, 128) * 4              # mu/r (lane-padded)
    return est + wbytes


def _strips_fwd(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
                num_heads, window, residual, weight_grads=True):
    out = _fused_strips_vjp(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
                            b_proj, num_heads, window, residual,
                            weight_grads)
    return out, (x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj)


def _strips_bwd(num_heads, window, residual, weight_grads, res, g):
    x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj = res
    hh, wd, c = x.shape[1], x.shape[2], x.shape[-1]
    s = window * window
    s_pad16 = s + (-s) % 16
    window_live = 12 * s_pad16 * s_pad16 + 18 * s_pad16 * c
    divisible = hh % window == 0 and wd % window == 0
    if not weight_grads and not dispatch.xla_only():
        if (divisible and s % 16 == 0
                and window_live <= 8 * 1024 * 1024):
            dx = _fused_strips_bwd_impl(x, g, w_qkv, b_qkv, ln_scale,
                                        ln_bias, w_proj, num_heads, window,
                                        residual)
            zeros = [jnp.zeros_like(t) for t in
                     (w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj)]
            return (dx, *zeros)
        if strips_rem_supported(hh, wd, window, c, num_heads,
                                x.dtype.itemsize, bwd=True):
            dx = _fused_strips_rem_bwd_impl(x, g, w_qkv, b_qkv, ln_scale,
                                            ln_bias, w_proj, num_heads,
                                            window, residual)
            zeros = [jnp.zeros_like(t) for t in
                     (w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj)]
            return (dx, *zeros)

    xla_form = _xla_strips if divisible else _xla_strips_rem

    def ref(xx, ww, bb, ls, lb, wp, bp):
        return xla_form(xx, ww, bb, ls, lb, wp, bp, num_heads, window,
                        residual)

    _, vjp = jax.vjp(ref, x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj)
    return vjp(g)


_fused_strips_vjp.defvjp(_strips_fwd, _strips_bwd)


def _fwd(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
         attn_mask, pad_logmult, num_heads, n_pad, residual,
         weight_grads=True, masked=False):
    out = _fused_window_block_vjp(x, w_qkv, b_qkv, ln_scale, ln_bias,
                                  w_proj, b_proj, attn_mask, pad_logmult,
                                  num_heads, n_pad, residual,
                                  weight_grads, masked)
    return out, (x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
                 attn_mask, pad_logmult)


def _bwd(num_heads, n_pad, residual, weight_grads, masked, res, g):
    (x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
     attn_mask, pad_logmult) = res
    c = x.shape[-1]
    s_pad = x.shape[1] + (-x.shape[1]) % 16
    # The per-head weight-grad accumulators (dW + dWp, f32) plus one
    # window's live values must fit VMEM. Measured bounds on v5e: stage-3
    # 256-token windows fit; 496-token global blocks and stage 4's
    # c=1152/16-head accumulators (21 MB alone) do not — those use the XLA
    # recompute path instead. The dx-only (frozen-trunk) variant carries no
    # grad accumulators, so it gets a bigger window budget.
    grad_scratch = (16 * c * c) if weight_grads else 0
    window_live = 12 * s_pad * s_pad + 14 * s_pad * c
    live_budget = (4 if weight_grads else 8) * 1024 * 1024
    # pad-key modes (masked / n_pad>0): the pad key/value are frozen bias
    # slices, so the fused bwd supports them dx-only (interpret-tested).
    # Measured end-to-end the fused n_pad>0 dx-only bwd is NOT faster than
    # the XLA recompute (103.7 vs 104.9 img/s same-session — the recompute's
    # slice DMAs are fully overlapped), so dispatch keeps the XLA path for
    # n_pad>0; masked mode still requires the fused form (docs/PERF.md).
    fused_ok = (masked and not weight_grads) or (not masked and n_pad == 0)
    if (fused_ok and grad_scratch <= 8 * 1024 * 1024
            and window_live <= live_budget
            and not dispatch.xla_only()):
        dx, dw, db, dls, dlb, dwp, dbp = _fused_window_block_bwd_impl(
            x, g, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
            num_heads, residual, weight_grads,
            attn_mask if masked else None, pad_logmult if masked else None,
            n_pad=0 if masked else n_pad,
        )
        mz = (jnp.zeros_like(attn_mask), jnp.zeros_like(pad_logmult))
        if not weight_grads:
            # frozen block (reference hard-freezes the trunk): callers pair
            # this with stop_gradient on the weights, so zeros are exact
            zeros = [jnp.zeros_like(t) for t in
                     (w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj)]
            return (dx, *zeros, *mz)
        return (dx, dw, db, dls, dlb, dwp, dbp.astype(b_proj.dtype), *mz)

    def ref(xx, ww, bb, ls, lb, wp, bp):
        return _xla_window_block(xx, ww, bb, ls, lb, wp, bp,
                                 num_heads, n_pad, residual,
                                 attn_mask if masked else None,
                                 pad_logmult if masked else None)

    _, vjp = jax.vjp(ref, x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj)
    return (*vjp(g), jnp.zeros_like(attn_mask), jnp.zeros_like(pad_logmult))


_fused_window_block_vjp.defvjp(_fwd, _bwd)
