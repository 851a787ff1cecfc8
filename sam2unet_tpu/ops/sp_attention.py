"""Sequence-parallel attention over a device mesh axis.

The reference bounds attention cost architecturally (window attention +
3 global blocks, SURVEY §5 long-context) and has no distributed story.
Here the global-attention blocks — the only full-sequence attention in
the trunk (hieradet.py:242-243) — get a genuinely TPU-native
sequence-parallel path for multi-chip meshes: tokens sharded over a mesh
axis inside `shard_map`, with two interchangeable schedules:

- `ring_sdpa`: ring attention — K/V blocks rotate around the axis via
  `lax.ppermute` (neighbor hops ride ICI) while a numerically-stable
  online softmax (running max / normalizer, f32 accumulators) folds each
  block in. Peak memory per device: O(S_local * S_local) scores.
- `allgather_sdpa`: all-gather K/V once, one local softmax over the full
  key axis. Fewer, larger collectives; right when S fits HBM easily.

Both return outputs sharded exactly like q, bit-comparable to the dense
`ops.attention.sdpa` within f32 tolerance (tests/test_sp_attention.py
asserts this on an 8-device mesh). Inputs are (B, S_local, H, D) shards
of the (B, S, H, D) global arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def allgather_sdpa(q, k, v, axis_name: str, scale: float | None = None):
    """Sequence-parallel attention with gathered keys/values."""
    from sam2unet_tpu.ops.attention import sdpa

    k_full = lax.all_gather(k, axis_name, axis=1, tiled=True)
    v_full = lax.all_gather(v, axis_name, axis=1, tiled=True)
    return sdpa(q, k_full, v_full, scale=scale)


def ring_sdpa(q, k, v, axis_name: str, scale: float | None = None):
    """Ring attention: rotate K/V shards around `axis_name`, folding each
    block into an online softmax. q, k, v: (B, S_local, H, D)."""
    n = lax.psum(1, axis_name)
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d**0.5)

    qf = q.astype(jnp.float32)
    # derive the accumulators from q so shard_map types them as varying
    # over axis_name (fresh constants would be unvarying and the scan
    # carry types would not line up)
    zero = qf.sum(axis=-1) * 0.0
    m0 = zero - jnp.inf
    l0 = zero
    o0 = qf * 0.0

    def fold(k_blk, v_blk, m, l, o):
        s = jnp.einsum(
            "bqhd,bkhd->bqhk", qf, k_blk.astype(jnp.float32)
        ) * scale
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bqhk,bkhd->bqhd", p, v_blk.astype(jnp.float32)
        )
        return m_new, l, o

    # fold the resident block first, then n-1 permute-then-fold steps:
    # each step every device hands its current K/V block to the next
    # device (neighbor hops ride ICI), so after the scan every q shard
    # has seen every k block with no wasted final rotation
    m, l, o = fold(k, v, m0, l0, o0)

    def body(carry, _):
        k_blk, v_blk, m, l, o = carry
        k_blk = lax.ppermute(k_blk, axis_name, _ring_perm(n))
        v_blk = lax.ppermute(v_blk, axis_name, _ring_perm(n))
        m, l, o = fold(k_blk, v_blk, m, l, o)
        return (k_blk, v_blk, m, l, o), None

    (_, _, m, l, o), _ = lax.scan(body, (k, v, m, l, o), None, length=n - 1)
    return (o / l[..., None]).astype(q.dtype)


def _ring_perm(n):
    """Static neighbor permutation [(0,1),(1,2),...,(n-1,0)]. `n` must be
    a Python int inside shard_map (axis sizes are static)."""
    n = int(n)
    return [(i, (i + 1) % n) for i in range(n)]
