"""Fused attention Pallas kernels for TPU.

Motivation: the model is HBM-bandwidth-bound and the dominant traffic is the
materialized (S x S) score/softmax matrices of 48 attention blocks (XLA
keeps 2-3 HBM round trips per block). These kernels keep the whole softmax
chain in VMEM.

Two regimes:
  - `_fused_full`: sequences up to ~1k tokens (windows of 64/196/256
    tokens, 484-token global blocks at 352 input) — one program per
    (batch*head), full S x S in VMEM, no streaming.
  - `_stream_*`: tiled online-softmax flash for longer sequences (the
    3600-token global blocks at 960 input, 4096 at SAM2's 1024), forward
    AND backward kernels. Block specs index the (B, S, H, D) tensors
    directly (head picked via index-map div/mod), so no (B,S,H,D) ->
    (B*H,S,D) relayout copies are introduced. Without this regime XLA
    materializes the (S, S) f32 score chain to HBM — 6.6 GB per global
    block at hiera_s@960 batch 32, the top writer in the @960 profile —
    and the autodiff backward materializes four more.
  - sequences whose lengths defeat both (no aligned divisor) fall back
    to XLA.

Layout contract: (B, S, H, D) with B carrying any folded window dimension —
matches the model's head layout so no transposes are introduced. D is
zero-padded to the 128-lane width once (cheap, fused) rather than letting
every matmul run on a ragged 72-wide tile.

Backward: jax.custom_vjp with an einsum recompute (correct, Ok perf); a
fused backward kernel is a planned optimization.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from sam2unet_tpu.ops.pallas import dispatch
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_FULL_SEQ = 1024


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # refs: (G, S, D) in VMEM; one batched dot_general covers all G rows per
    # grid step (no unrolling — Mosaic lowers the batch dim natively), so
    # the grid-step overhead amortizes over G*2 matmuls.
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = o.astype(o_ref.dtype)


def _pick_group(n: int, sq: int, sk: int, d: int, itemsize: int) -> int:
    """Largest divisor of n (<= 8) keeping VMEM blocks ~<= 4 MB."""
    per_row = (2 * sq + 2 * sk) * d * itemsize * 2
    target = max(1, (4 * 1024 * 1024) // max(per_row, 1))
    g = min(n, target, 8)
    while n % g:
        g -= 1
    return max(g, 1)


def _fused_full(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                scale: float | None = None) -> jnp.ndarray:
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    n = b * h

    # (B, S, H, D) -> (B*H, S, D): one bf16 layout change, far cheaper than
    # the fp32 score-matrix round trips this kernel removes.
    qf = q.transpose(0, 2, 1, 3).reshape(n, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(n, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(n, sk, d)
    g = _pick_group(n, sq, sk, d, q.dtype.itemsize)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, sq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, sk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, sq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, sq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * sq * sk * (2 * d),
            bytes_accessed=(2 * n * (sq + 2 * sk) * d) * q.dtype.itemsize,
            transcendentals=n * sq * sk,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


_STREAM_BLOCKS = (768, 720, 640, 576, 512, 448, 400, 384, 320, 288, 256,
                  240, 224, 192, 160, 128, 96, 64, 32, 16)


def _pick_stream_blocks(sq: int, sk: int) -> tuple[int, int] | None:
    """Largest 16-aligned block sizes dividing the two sequence lengths
    exactly (no masking needed in the kernels); None -> XLA fallback."""

    def pick(s: int) -> int | None:
        for b in _STREAM_BLOCKS:
            if b <= s and s % b == 0:
                return b
        return None

    bq, bk = pick(sq), pick(sk)
    if bq is None or bk is None:
        return None
    return bq, bk


def _stream_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr,
                       acc, *, scale: float, nkv: int):
    ik = pl.program_id(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                      # (bq, bk)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full(m_scr.shape, -1e30, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        acc[:] = jnp.zeros(acc.shape, jnp.float32)

    m_prev = m_scr[:]                              # (bq, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    e = jnp.exp(s - m_new)                         # (bq, bk) f32
    l_scr[:] = l_scr[:] * alpha + jnp.sum(e, axis=-1, keepdims=True)
    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new

    @pl.when(ik == nkv - 1)
    def _():
        o_ref[0] = (acc[:] / l_scr[:]).astype(o_ref.dtype)
        lse_ref[0] = m_scr[:] + jnp.log(l_scr[:])


def _to_flat(t):
    """(B, S, H, D) -> (B*H, S, D)."""
    b, s, h, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _from_flat(t, b, h):
    n, s, d = t.shape
    return t.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _stream_fwd_impl(q, k, v, scale, interpret=False):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bq, bk = _pick_stream_blocks(sq, sk)
    nq, nkv = sq // bq, sk // bk
    n = b * h
    qspec = pl.BlockSpec((1, bq, d), lambda i, iq, ik: (i, iq, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, bk, d), lambda i, iq, ik: (i, ik, 0),
                          memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_stream_fwd_kernel, scale=scale, nkv=nkv),
        grid=(n, nq, nkv),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=[
            qspec,
            pl.BlockSpec((1, bq, 1), lambda i, iq, ik: (i, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, sq, d), q.dtype),
            jax.ShapeDtypeStruct((n, sq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * sq * sk * 2 * d,
            bytes_accessed=(n * (sq * nkv + 2 * sk * nq) * d)
            * q.dtype.itemsize,
            transcendentals=n * sq * sk,
        ),
        interpret=interpret,
    )(_to_flat(q), _to_flat(k), _to_flat(v))
    return _from_flat(out, b, h), lse


def _stream_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
                          dq_ref, acc, *, scale: float, nkv: int):
    ik = pl.program_id(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]                               # (bq, 1)
    delta = dl_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)                           # (bq, bk) f32
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    contrib = jax.lax.dot_general(
        ds.astype(q.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(ik == 0)
    def _():
        acc[:] = contrib

    @pl.when(ik > 0)
    def _():
        acc[:] = acc[:] + contrib

    @pl.when(ik == nkv - 1)
    def _():
        dq_ref[0] = acc[:].astype(dq_ref.dtype)


def _stream_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
                           dk_ref, dv_ref, acck, accv, *, scale: float,
                           nq: int):
    iq = pl.program_id(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0].reshape(1, -1)                # (bq, 1) -> (1, bq)
    delta = dl_ref[0].reshape(1, -1)
    st = jax.lax.dot_general(                      # (bk, bq)
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    pt = jnp.exp(st - lse)
    dv_c = jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dst = pt * (dpt - delta)
    dk_c = jax.lax.dot_general(
        dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(iq == 0)
    def _():
        acck[:] = dk_c
        accv[:] = dv_c

    @pl.when(iq > 0)
    def _():
        acck[:] = acck[:] + dk_c
        accv[:] = accv[:] + dv_c

    @pl.when(iq == nq - 1)
    def _():
        dk_ref[0] = acck[:].astype(dk_ref.dtype)
        dv_ref[0] = accv[:].astype(dv_ref.dtype)


def _stream_bwd_impl(q, k, v, o, lse, g, scale, interpret=False):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bq, bk = _pick_stream_blocks(sq, sk)
    nq, nkv = sq // bq, sk // bk
    n = b * h
    qf, kf, vf = _to_flat(q), _to_flat(k), _to_flat(v)
    gf = _to_flat(g)
    # delta_i = sum_d do_i * o_i — one tiny (N, Sq, 1) f32 tensor
    delta = jnp.einsum("bqhd,bqhd->bhq", g.astype(jnp.float32),
                       o.astype(jnp.float32)).reshape(n, sq, 1)
    qspec = pl.BlockSpec((1, bq, d), lambda i, iq, ik: (i, iq, 0),
                         memory_space=pltpu.VMEM)
    kvspec_q = pl.BlockSpec((1, bk, d), lambda i, iq, ik: (i, ik, 0),
                            memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, bq, 1), lambda i, iq, ik: (i, iq, 0),
                           memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_stream_bwd_dq_kernel, scale=scale, nkv=nkv),
        grid=(n, nq, nkv),
        in_specs=[qspec, kvspec_q, kvspec_q, qspec, rowspec, rowspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((n, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * sq * sk * 3 * d,
            bytes_accessed=(n * (2 * sq * nkv + 2 * sk * nq) * d)
            * q.dtype.itemsize,
            transcendentals=n * sq * sk,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lse, delta)
    # dk/dv: kv blocks outer, q blocks inner (the accumulated axis)
    qspec_k = pl.BlockSpec((1, bq, d), lambda i, ik, iq: (i, iq, 0),
                           memory_space=pltpu.VMEM)
    kvspec_k = pl.BlockSpec((1, bk, d), lambda i, ik, iq: (i, ik, 0),
                            memory_space=pltpu.VMEM)
    rowspec_k = pl.BlockSpec((1, bq, 1), lambda i, ik, iq: (i, iq, 0),
                             memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_stream_bwd_dkv_kernel, scale=scale, nq=nq),
        grid=(n, nkv, nq),
        in_specs=[qspec_k, kvspec_k, kvspec_k, qspec_k, rowspec_k,
                  rowspec_k],
        out_specs=[kvspec_k, kvspec_k],
        out_shape=[
            jax.ShapeDtypeStruct((n, sk, d), k.dtype),
            jax.ShapeDtypeStruct((n, sk, d), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32),
                        pltpu.VMEM((bk, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * sq * sk * 4 * d,
            bytes_accessed=(n * (2 * sq * nkv + 4 * sk * nq) * d)
            * q.dtype.itemsize,
            transcendentals=n * sq * sk,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lse, delta)
    return (_from_flat(dq, b, h), _from_flat(dk, b, h),
            _from_flat(dv, b, h))


def _xla_attention(q, k, v, scale=None, key_valid=None):
    """Manual-einsum attention: fp32 scores + jax.nn.softmax, probabilities
    cast to the value dtype for the output matmul.

    Outperforms both jax.nn.dot_product_attention and the fused Pallas
    kernel at this model's head width (72 lanes under-fills the MXU;
    measured on v5e). Also serves as the custom-VJP recompute. See the
    NOTE below: a hand-split bf16-score/folded-division variant was
    measured SLOWER and rejected."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    # NOTE: a bf16-score variant (bf16 S/exp tensors, softmax division folded
    # into the output) measured 121 img/s end-to-end vs 149 for this plain
    # form — XLA's native softmax fusion beats hand-split reductions here.
    # The bqhk score layout keeps (token, head) adjacency matching the
    # (B, S, H, D) inputs, avoiding head transposes around the matmuls.
    s = jnp.einsum("bqhd,bkhd->bqhk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if key_valid is not None:
        # drop padded keys (fixed-shape memory signatures): -inf logits
        s = jnp.where(key_valid[:, None, None, :], s, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqhk,bkhd->bqhd", p.astype(v.dtype), v)


def attention_with_padkey(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_pad: jnp.ndarray,
    v_pad: jnp.ndarray,
    n_pad: int | None = None,
    scale: float | None = None,
    attn_mask: jnp.ndarray | None = None,
    pad_logmult: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Attention over valid tokens plus ONE synthetic pad key per head.

    Reproduces the reference's padded window attention (hieradet.py:60-74
    over utils.py:16-35 zero-padded windows) without computing pad tokens:
    every pad token's projected q/k/v equals the projection bias exactly
    (qkv(0) = bias), so the n_pad identical pad keys collapse under softmax
    to a single key with logit + ln(n_pad) and value v_pad. Mathematically
    identical to materializing the pads; 2-3x fewer score FLOPs/bytes on
    the remainder windows.

    q/k/v: (B, S, H, D) valid tokens; k_pad/v_pad: (H, D) per-head bias.
    Exactly one of `n_pad` (shared multiplicity) or `pad_logmult` ((1, S)
    additive per-query log-multiplicity, -1e30 where a query's window has
    no pads) must be given; `attn_mask` ((S, S) additive, e.g. the
    block-diagonal whole-grid window mask) applies to the real keys.
    """
    assert (n_pad is None) != (pad_logmult is None), \
        "pass exactly one of n_pad / pad_logmult"
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bqhd,bkhd->bqhk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if attn_mask is not None:
        s = s + attn_mask[None, :, None, :]
    # synthetic key: logit of the shared pad token + its log-multiplicity
    s_pad = jnp.einsum("bqhd,hd->bqh", q, k_pad.astype(q.dtype),
                       preferred_element_type=jnp.float32) * scale
    if pad_logmult is not None:
        s_pad = s_pad + pad_logmult.reshape(-1)[None, :, None]
    else:
        s_pad = s_pad + math.log(n_pad)
    p = jax.nn.softmax(jnp.concatenate([s, s_pad[..., None]], axis=-1), axis=-1)
    out = jnp.einsum("bqhk,bkhd->bqhd", p[..., :-1].astype(v.dtype), v)
    return out + p[..., -1:].astype(v.dtype) * v_pad.astype(v.dtype)


def _dispatch_fwd(q, k, v, scale):
    """Pick a regime; returns (out, lse) with lse None unless streaming
    ran (the streaming backward needs it)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if dispatch.xla_only():
        return _xla_attention(q, k, v, scale=scale), None
    if k.shape[1] <= _MAX_FULL_SEQ:
        return _fused_full(q, k, v, scale=scale), None
    if _pick_stream_blocks(q.shape[1], k.shape[1]) is None:
        return _xla_attention(q, k, v, scale=scale), None
    return _stream_fwd_impl(q, k, v, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float | None = None) -> jnp.ndarray:
    """Fused attention over (B, S, H, D); numerics match
    torch.nn.functional.scaled_dot_product_attention."""
    return _dispatch_fwd(q, k, v, scale)[0]


def _fwd(q, k, v, scale):
    out, lse = _dispatch_fwd(q, k, v, scale)
    return out, (q, k, v, out if lse is not None else None, lse)


def _bwd(scale, res, g):
    q, k, v, o, lse = res
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if lse is not None:
        return _stream_bwd_impl(q, k, v, o, lse, g, scale)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, g32).astype(v.dtype)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = (jnp.einsum("bhqk,bkhd->bqhd", ds, k.astype(jnp.float32)) * scale).astype(q.dtype)
    dk = (jnp.einsum("bhqk,bqhd->bkhd", ds, q.astype(jnp.float32)) * scale).astype(k.dtype)
    return dq, dk, dv


flash_attention.defvjp(_fwd, _bwd)
