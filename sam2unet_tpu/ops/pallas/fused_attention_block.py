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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6


def _kernel(x_ref, w_ref, b_ref, ln_ref, wp_ref, bp_ref, kvp_ref, o_ref,
            y_buf, acc,
            *, nh: int, n_pad: int, scale: float, residual: bool,
            s_valid: int):
    h = pl.program_id(1)
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
        y2, w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    b3 = b_ref[:].astype(jnp.float32)              # (1, 1, 3d)
    qkv = (qkv + b3[0]).astype(x.dtype)
    d = qkv.shape[-1] // 3
    q = qkv[:, :d].reshape(g, s, d)
    k = qkv[:, d : 2 * d].reshape(g, s, d)
    v = qkv[:, 2 * d :].reshape(g, s, d)

    sc = jax.lax.dot_general(                      # (G, S, S) fp32
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    if s_valid < s:
        # caller row-padded S up to a relayout-friendly multiple; the pad
        # rows must not act as keys (queries are cropped by the caller)
        col = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 2)
        sc = jnp.where(col < s_valid, sc, -1e30)

    if n_pad:
        kvp = kvp_ref[:].astype(jnp.float32)       # (1, 2, d), lane-aligned
        k_pad = kvp[:, 0:1, :]                     # (1, 1, d)
        v_pad = kvp[:, 1:2, :]
        sp = jnp.sum(q.astype(jnp.float32) * k_pad, axis=-1) * scale
        sp = sp + math.log(n_pad)                  # (G, S)
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
    if n_pad:
        o = o + (ep / den)[..., None] * v_pad

    out_h = jax.lax.dot_general(                   # (G*S, c) fp32
        o.astype(x.dtype).reshape(g * s, d), wp_ref[0],
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


def _pick_group(n_windows: int, s: int, c: int, d: int) -> int:
    """Largest divisor of n_windows keeping live VMEM values ~<= 5 MB
    (x/y/out blocks, qkv + scores values, per-group weight broadcasts)."""
    per_window = s * c * 14 + s * s * 8 + 8 * c * d
    target = max(1, (5 * 1024 * 1024) // max(per_window, 1))
    g = min(n_windows, target, 128)
    while n_windows % g:
        g -= 1
    return max(g, 1)


def _xla_window_block(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
                      num_heads, n_pad=0, residual=True):
    """Reference XLA form (CPU fallback, VJP recompute, tests)."""
    from sam2unet_tpu.ops.pallas.flash_attention import (
        _xla_attention,
        attention_with_padkey,
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
    if n_pad:
        b3 = b_qkv.reshape(3, num_heads, d)
        o = attention_with_padkey(q, k, v, b3[1], b3[2], n_pad)
    else:
        o = _xla_attention(q, k, v)
    o = o.reshape(nw, s, c)
    out = jnp.dot(o, w_proj.astype(x.dtype),
                  preferred_element_type=jnp.float32) + b_proj
    out = out.astype(x.dtype)
    return x + out if residual else out


def fused_window_block(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
                       num_heads: int, n_pad: int = 0,
                       residual: bool = True):
    """x: (nW, S, c) window rows -> (nW, S, c) attention-block output."""
    return _fused_window_block_vjp(
        x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
        num_heads, n_pad, residual,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_window_block_vjp(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj,
                            b_proj, num_heads, n_pad, residual):
    if jax.default_backend() != "tpu":
        return _xla_window_block(x, w_qkv, b_qkv, ln_scale, ln_bias,
                                 w_proj, b_proj, num_heads, n_pad, residual)
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
        s = s + row_pad
    g = _pick_group(nw, s, c, d)
    # per-head weight layout: qkv (c, [3, nh, d]) -> (nh, c, 3d);
    # bias (3c,) -> (nh, 1, 3d); proj rows ([nh, d], c) -> (nh, d, c)
    w3 = w_qkv.reshape(c, 3, nh, d).transpose(2, 0, 1, 3).reshape(nh, c, 3 * d)
    b3 = b_qkv.reshape(3, nh, d).transpose(1, 0, 2).reshape(nh, 1, 3 * d)
    wp3 = w_proj.reshape(nh, d, c)
    ln = jnp.stack([jnp.asarray(ln_scale, x.dtype),
                    jnp.asarray(ln_bias, x.dtype)])
    out = pl.pallas_call(
        functools.partial(_kernel, nh=nh, n_pad=n_pad,
                          scale=1.0 / math.sqrt(d), residual=residual,
                          s_valid=s_valid),
        grid=(nw // g, nh),
        in_specs=[
            pl.BlockSpec((g, s, c), lambda i, h: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 3 * d), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3 * d), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, c), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, d), lambda i, h: (h, 0, 0),
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
    )(x, w3.astype(x.dtype), b3.astype(jnp.float32), ln,
      wp3.astype(x.dtype), b_proj.reshape(1, -1).astype(jnp.float32),
      # (nh, 2, d): per-head [k_pad; v_pad] rows, lane-aligned for the
      # synthetic-pad-key path (zeros, unused, when n_pad == 0)
      b_qkv.reshape(3, nh, d)[1:].transpose(1, 0, 2).astype(jnp.float32))
    if row_pad:
        out = out[:, :s_valid]
    return out


def _fwd(x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj,
         num_heads, n_pad, residual):
    out = _fused_window_block_vjp(x, w_qkv, b_qkv, ln_scale, ln_bias,
                                  w_proj, b_proj, num_heads, n_pad, residual)
    return out, (x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj)


def _bwd(num_heads, n_pad, residual, res, g):
    x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj = res

    def ref(*args):
        return _xla_window_block(*args, num_heads, n_pad, residual)

    _, vjp = jax.vjp(ref, x, w_qkv, b_qkv, ln_scale, ln_bias, w_proj, b_proj)
    return vjp(g)


_fused_window_block_vjp.defvjp(_fwd, _bwd)
