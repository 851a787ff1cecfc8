"""Kernel-dispatch switch: Pallas on TPU, XLA reference forms elsewhere.

Every fused kernel consults `xla_only()` at trace time. Besides the
backend check, `force_xla()` lets multi-platform tracing (StableHLO export
with platforms=("cpu","tpu"), interop/export.py) bake in the portable XLA
graph — Mosaic custom calls cannot lower for the CPU platform."""

from __future__ import annotations

import contextlib
import contextvars

import jax

_FORCE_XLA = contextvars.ContextVar("sam2unet_force_xla", default=False)


def xla_only() -> bool:
    return _FORCE_XLA.get() or jax.default_backend() != "tpu"


@contextlib.contextmanager
def force_xla():
    token = _FORCE_XLA.set(True)
    try:
        yield
    finally:
        _FORCE_XLA.reset(token)


def io_alias(mapping: dict) -> dict:
    """input_output_aliases for the dx-only backward kernels, env-gated
    (SAM2UNET_DISABLE_ALIAS=1 -> {}) so perf A/Bs can bisect the donation:
    aliasing can INCREASE memory when XLA must insert a defensive copy of
    a donated operand that is not provably dead."""
    import os

    if os.environ.get("SAM2UNET_DISABLE_ALIAS"):
        return {}
    return mapping
