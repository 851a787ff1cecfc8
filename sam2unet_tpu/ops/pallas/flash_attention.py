"""Fused attention Pallas kernels for TPU.

Motivation: the model is HBM-bandwidth-bound and the dominant traffic is the
materialized (S x S) score/softmax matrices of 48 attention blocks (XLA
keeps 2-3 HBM round trips per block). These kernels keep the whole softmax
chain in VMEM.

Two regimes:
  - `_fused_full`: sequences up to ~1k tokens (every SAM2-UNet case at 352
    and 960 inputs: windows of 64/196/256 tokens, global blocks of 484/3600)
    — one program per (batch*head), full S x S in VMEM, no streaming.
  - longer sequences fall back to XLA (a tiled streaming-flash variant is
    the planned extension for SAM2's 1024-input global blocks).

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float | None = None) -> jnp.ndarray:
    """Fused attention over (B, S, H, D); numerics match
    torch.nn.functional.scaled_dot_product_attention."""
    if k.shape[1] > _MAX_FULL_SEQ or dispatch.xla_only():
        return _xla_attention(q, k, v, scale=scale)
    return _fused_full(q, k, v, scale=scale)


def _fwd(q, k, v, scale):
    return flash_attention(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
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
