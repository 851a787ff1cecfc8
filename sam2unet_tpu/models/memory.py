"""Memory encoder + memory attention for video tracking.

JAX re-design of sam2/modeling/memory_encoder.py:17-181 and
memory_attention.py:17-169. NHWC; the ConvNeXt fuser's channel LayerNorm is
native (no permutes); sequence-first torch conventions become batch-first.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from sam2unet_tpu.models.position_encoding import sine_position_embedding
from sam2unet_tpu.models.transformer import RoPEAttention
from sam2unet_tpu.nn.layers import gelu


class MaskDownSampler(nn.Module):
    """Stride-16 conv stack over the mask (memory_encoder.py:17-58)."""

    embed_dim: int = 256
    kernel_size: int = 4
    stride: int = 4
    padding: int = 0
    total_stride: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        num_layers = int(math.log2(self.total_stride) // math.log2(self.stride))
        chans = 1
        idx = 0
        for _ in range(num_layers):
            chans = chans * self.stride**2
            x = nn.Conv(
                chans, (self.kernel_size, self.kernel_size), strides=self.stride,
                padding=self.padding, dtype=self.dtype,
                name=f"encoder_layers_{idx}",
            )(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"encoder_layers_{idx + 1}")(x)
            x = gelu(x)
            idx += 3
        return nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                       name=f"encoder_layers_{idx}")(x)


class CXBlock(nn.Module):
    """ConvNeXt block (memory_encoder.py:62-117), NHWC-native."""

    dim: int
    kernel_size: int = 7
    padding: int = 3
    layer_scale_init_value: float = 1e-6
    use_dwconv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp = x
        x = nn.Conv(
            self.dim, (self.kernel_size, self.kernel_size),
            padding=self.padding,
            feature_group_count=self.dim if self.use_dwconv else 1,
            dtype=self.dtype, name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,),
            )
            x = gamma.astype(self.dtype) * x
        return inp + x


class Fuser(nn.Module):
    """(memory_encoder.py:120-135)."""

    dim: int
    num_layers: int
    kernel_size: int = 7
    padding: int = 3
    layer_scale_init_value: float = 1e-6
    use_dwconv: bool = True
    input_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.input_projection:
            x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="proj")(x)
        for i in range(self.num_layers):
            x = CXBlock(
                self.dim, self.kernel_size, self.padding,
                self.layer_scale_init_value, self.use_dwconv, self.dtype,
                name=f"layers_{i}",
            )(x)
        return x


class MemoryEncoder(nn.Module):
    """(memory_encoder.py:138-181): mask downsample + pix-feat fuse -> 64ch
    memory features + sine PE."""

    out_dim: int = 64
    in_dim: int = 256
    fuser_layers: int = 2
    # mask-downsampler shape knobs (sam2_hiera_*.yaml: kernel 3, stride 2).
    # mds_embed_dim mirrors the reference MaskDownSampler's independent
    # embed_dim knob (memory_encoder.py:17-26); None derives it from in_dim,
    # which is what every shipped config does (both are 256) — and the only
    # consistent choice, since the downsampled mask is added to the in_dim-
    # channel pix_feat projection.
    mds_embed_dim: int | None = None
    mds_kernel: int = 3
    mds_stride: int = 2
    mds_padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, pix_feat: jnp.ndarray, masks: jnp.ndarray,
        skip_mask_sigmoid: bool = False,
    ) -> dict:
        """pix_feat: (B, H, W, in_dim); masks: (B, 16H, 16W, 1)."""
        if not skip_mask_sigmoid:
            masks = nn.sigmoid(masks)
        masks = MaskDownSampler(
            self.mds_embed_dim or self.in_dim,
            kernel_size=self.mds_kernel, stride=self.mds_stride,
            padding=self.mds_padding, dtype=self.dtype, name="mask_downsampler",
        )(masks)
        x = nn.Conv(self.in_dim, (1, 1), dtype=self.dtype, name="pix_feat_proj")(pix_feat)
        x = x + masks
        x = Fuser(self.in_dim, self.fuser_layers, dtype=self.dtype, name="fuser")(x)
        if self.out_dim != self.in_dim:
            x = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="out_proj")(x)
        pos = jnp.asarray(
            sine_position_embedding(x.shape[1], x.shape[2], self.out_dim),
            x.dtype,
        )
        return {"vision_features": x, "vision_pos_enc": [pos[None]]}


class MemoryAttentionLayer(nn.Module):
    """RoPE self-attn + RoPE cross-attn to memory + FFN
    (memory_attention.py:17-99). Batch-first: (B, S, C)."""

    d_model: int = 256
    dim_feedforward: int = 2048
    pos_enc_at_attn: bool = False
    pos_enc_at_cross_attn_keys: bool = True
    pos_enc_at_cross_attn_queries: bool = False
    rope_feat_sizes: tuple[int, int] = (32, 32)
    kv_in_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        self.self_attn = RoPEAttention(
            embedding_dim=self.d_model, num_heads=1, downsample_rate=1,
            feat_sizes=self.rope_feat_sizes, dtype=dt,
        )
        self.cross_attn_image = RoPEAttention(
            embedding_dim=self.d_model, num_heads=1, downsample_rate=1,
            rope_k_repeat=True, kv_in_dim=self.kv_in_dim,
            feat_sizes=self.rope_feat_sizes, dtype=dt,
        )
        self.linear1 = nn.Dense(self.dim_feedforward, dtype=dt)
        self.linear2 = nn.Dense(self.d_model, dtype=dt)
        self.norm1 = nn.LayerNorm(dtype=dt)
        self.norm2 = nn.LayerNorm(dtype=dt)
        self.norm3 = nn.LayerNorm(dtype=dt)

    def __call__(self, tgt, memory, pos=None, query_pos=None,
                 num_k_exclude_rope: int = 0, memory_valid=None):
        t2 = self.norm1(tgt)
        q = t2 + query_pos if (self.pos_enc_at_attn and query_pos is not None) else t2
        tgt = tgt + self.self_attn(q, q, t2)

        t2 = self.norm2(tgt)
        qq = (
            t2 + query_pos
            if (self.pos_enc_at_cross_attn_queries and query_pos is not None)
            else t2
        )
        kk = (
            memory + pos
            if (self.pos_enc_at_cross_attn_keys and pos is not None)
            else memory
        )
        tgt = tgt + self.cross_attn_image(
            qq, kk, memory, num_k_exclude_rope=num_k_exclude_rope,
            key_valid=memory_valid,
        )

        t2 = self.norm3(tgt)
        tgt = tgt + self.linear2(nn.relu(self.linear1(t2)))
        return tgt


class MemoryAttention(nn.Module):
    """(memory_attention.py:102-169), batch-first (B, S, C)."""

    d_model: int = 256
    num_layers: int = 4
    pos_enc_at_input: bool = True
    dim_feedforward: int = 2048
    kv_in_dim: int = 64
    rope_feat_sizes: tuple[int, int] = (32, 32)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            MemoryAttentionLayer(
                d_model=self.d_model,
                dim_feedforward=self.dim_feedforward,
                kv_in_dim=self.kv_in_dim,
                rope_feat_sizes=self.rope_feat_sizes,
                dtype=self.dtype,
                name=f"layers_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.norm = nn.LayerNorm(dtype=self.dtype)

    def __call__(self, curr, memory, curr_pos=None, memory_pos=None,
                 num_obj_ptr_tokens: int = 0, memory_valid=None):
        output = curr
        if self.pos_enc_at_input and curr_pos is not None:
            output = output + 0.1 * curr_pos
        for layer in self.layers:
            output = layer(
                output, memory, pos=memory_pos, query_pos=curr_pos,
                num_k_exclude_rope=num_obj_ptr_tokens,
                memory_valid=memory_valid,
            )
        return self.norm(output)
