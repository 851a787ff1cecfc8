"""Two-way transformer + projection attention (+RoPE variant).

JAX re-design of sam2/modeling/sam/transformer.py:30-332. Attention runs in
the framework's (B, S, H, D) layout via ops.attention.sdpa — no per-layer
head transposes; the reference's hard-coded math-kernel override
(transformer.py:24-27) is irrelevant here since the backend is XLA/Pallas.
"""

from __future__ import annotations

import math
from functools import partial

import flax.linen as nn
import jax.numpy as jnp

from sam2unet_tpu.models.position_encoding import apply_rotary_enc, axial_rope_cos_sin
from sam2unet_tpu.nn.layers import MLP
from sam2unet_tpu.ops.attention import sdpa


class Attention(nn.Module):
    """Multi-head attention with optional internal downsampling
    (transformer.py:201-265)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    # accepted for reference-config parity only (transformer.py:208-216 sizes
    # the k/v projections with it); flax Dense infers the input width, so the
    # value never changes behavior
    kv_in_dim: int | None = None
    dtype: jnp.dtype = jnp.float32

    @property
    def internal_dim(self) -> int:
        return self.embedding_dim // self.downsample_rate

    def setup(self):
        self.q_proj = nn.Dense(self.internal_dim, dtype=self.dtype)
        self.k_proj = nn.Dense(self.internal_dim, dtype=self.dtype)
        self.v_proj = nn.Dense(self.internal_dim, dtype=self.dtype)
        self.out_proj = nn.Dense(self.embedding_dim, dtype=self.dtype)

    def _heads(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        return x.reshape(b, n, self.num_heads, c // self.num_heads)

    def __call__(self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        q = self._heads(self.q_proj(q))
        k = self._heads(self.k_proj(k))
        v = self._heads(self.v_proj(v))
        o = sdpa(q, k, v)
        b, n, h, d = o.shape
        return self.out_proj(o.reshape(b, n, h * d))


class RoPEAttention(nn.Module):
    """Attention with axial 2-D rotary embedding on the (square) token grid
    (transformer.py:268-332). Frequencies are trace-time constants derived
    from the static sequence length."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    # kv_in_dim/feat_sizes are accepted for reference-config parity only:
    # Dense infers the k/v input width, and the RoPE table is always derived
    # from the runtime token count (below) — the same result the reference
    # reaches by recomputing freqs_cis whenever the cached feat_sizes table
    # mismatches the actual sequence (transformer.py:285-293,303-311)
    kv_in_dim: int | None = None
    rope_theta: float = 10000.0
    rope_k_repeat: bool = False
    feat_sizes: tuple[int, int] = (32, 32)
    dtype: jnp.dtype = jnp.float32

    @property
    def internal_dim(self) -> int:
        return self.embedding_dim // self.downsample_rate

    def setup(self):
        self.q_proj = nn.Dense(self.internal_dim, dtype=self.dtype)
        self.k_proj = nn.Dense(self.internal_dim, dtype=self.dtype)
        self.v_proj = nn.Dense(self.internal_dim, dtype=self.dtype)
        self.out_proj = nn.Dense(self.embedding_dim, dtype=self.dtype)

    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        num_k_exclude_rope: int = 0,
        key_valid: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        b, nq, _ = q.shape
        nk = k.shape[1]
        h = self.num_heads
        d = self.internal_dim // h

        q = self.q_proj(q).reshape(b, nq, h, d)
        k = self.k_proj(k).reshape(b, nk, h, d)
        v = self.v_proj(v).reshape(b, nk, h, d)

        side = int(math.sqrt(nq))
        assert side * side == nq, "RoPE expects a square token grid"
        cos, sin = axial_rope_cos_sin(d, side, side, self.rope_theta)
        cos = jnp.asarray(cos)
        sin = jnp.asarray(sin)

        num_k_rope = nk - num_k_exclude_rope
        # rotate in (B, H, S, D) view
        qh = q.transpose(0, 2, 1, 3)
        kh = k.transpose(0, 2, 1, 3)
        qh, k_rot = apply_rotary_enc(
            qh, kh[:, :, :num_k_rope], cos, sin, repeat_freqs_k=self.rope_k_repeat
        )
        q = qh.transpose(0, 2, 1, 3)
        k = jnp.concatenate(
            [k_rot.transpose(0, 2, 1, 3), k[:, num_k_rope:]], axis=1
        ) if num_k_exclude_rope > 0 else k_rot.transpose(0, 2, 1, 3)

        o = sdpa(q, k, v, key_valid=key_valid)
        return self.out_proj(o.reshape(b, nq, h * d))


class TwoWayAttentionBlock(nn.Module):
    """(transformer.py:123-198)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        self.self_attn = Attention(self.embedding_dim, self.num_heads, dtype=dt)
        self.norm1 = nn.LayerNorm(dtype=dt)
        self.cross_attn_token_to_image = Attention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate, dtype=dt
        )
        self.norm2 = nn.LayerNorm(dtype=dt)
        self.mlp = MLP(self.mlp_dim, self.embedding_dim, num_layers=2,
                       activation=nn.relu, dtype=dt)
        self.norm3 = nn.LayerNorm(dtype=dt)
        self.norm4 = nn.LayerNorm(dtype=dt)
        self.cross_attn_image_to_token = Attention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate, dtype=dt
        )

    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + self.cross_attn_token_to_image(q, k, keys)
        queries = self.norm2(queries)

        queries = queries + self.mlp(queries)
        queries = self.norm3(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + self.cross_attn_image_to_token(k, q, queries)
        keys = self.norm4(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """(transformer.py:30-120). image_embedding: (B, H, W, C) NHWC;
    point_embedding: (B, N, C)."""

    depth: int
    embedding_dim: int
    num_heads: int
    mlp_dim: int
    attention_downsample_rate: int = 2
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                dtype=self.dtype,
                name=f"layers_{i}",
            )
            for i in range(self.depth)
        ]
        self.final_attn_token_to_image = Attention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            dtype=self.dtype,
        )
        self.norm_final_attn = nn.LayerNorm(dtype=self.dtype)

    def __call__(self, image_embedding, image_pe, point_embedding):
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(b, h * w, c) if image_pe.ndim == 4 else image_pe
        queries = point_embedding

        for layer in self.layers:
            queries, keys = layer(queries, keys, point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + self.final_attn_token_to_image(q, k, keys)
        queries = self.norm_final_attn(queries)
        return queries, keys
