"""Scaled dot-product attention entry point for the framework.

One function, several backends:
  - "einsum": manual einsum chain with bf16 probabilities — what "auto"
              resolves to everywhere: measured fastest at this model's
              72-wide heads (docs/PERF.md "Measured and rejected"), and
              the only path carrying the padded-key mask.
  - "xla":    jax.nn.dot_product_attention.
  - "pallas": fused flash-attention Pallas kernel (ops/pallas/) — kept
              for experimentation; measured slower at head_dim 72.

Numerics match torch.nn.functional.scaled_dot_product_attention with its
default scale 1/sqrt(head_dim) (reference call sites: hieradet.py:70-74,
sam2/modeling/sam/transformer.py:254-260).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_FORCE_IMPL: str | None = None  # test hook


def set_attention_impl(impl: str | None) -> None:
    """Force a backend globally ("xla" | "pallas" | None for auto)."""
    global _FORCE_IMPL
    _FORCE_IMPL = impl


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "auto",
    scale: float | None = None,
    key_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Attention over (B, S, num_heads, head_dim) tensors.

    `scale` defaults to 1/sqrt(head_dim); pass it explicitly when the head
    dim is zero-padded (the logical head width sets the temperature).
    `key_valid` (B, S_k) bool drops padded keys from the softmax — used by
    the fixed-shape (padded) memory-attention signatures."""
    if _FORCE_IMPL is not None:
        impl = _FORCE_IMPL
    if impl == "auto":
        # measured on v5e: the manual einsum with bf16 probabilities beats
        # both jax.nn.dot_product_attention and the fused Pallas kernel at
        # this model's 72-wide heads (docs/PERF.md "Measured and rejected")
        impl = "einsum"
        if key_valid is None and k.shape[1] > 1024:
            # LONG sequences (3600-token global blocks at 960 input, 4096
            # at 1024) are the exception: XLA materializes the (S, S) f32
            # score chain to HBM (6.6 GB per block at hiera_s@960 b32, the
            # top writer in that profile), so the tiled streaming-flash
            # kernels win there; flash_attention still falls back to the
            # einsum form when no aligned block divides the lengths.
            impl = "pallas"
    if key_valid is not None:
        impl = "einsum"  # only the einsum path carries the key mask
    if impl == "pallas":
        from sam2unet_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    if impl == "einsum":
        from sam2unet_tpu.ops.pallas.flash_attention import _xla_attention

        return _xla_attention(q, k, v, scale=scale, key_valid=key_valid)
    return jax.nn.dot_product_attention(q, k, v, scale=scale)
