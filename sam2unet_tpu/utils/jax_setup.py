"""Global JAX runtime setup.

Compilation in this environment is expensive per-invocation, so the rules
are: (1) everything — including model.init — runs under jit so each program
compiles exactly once; (2) a persistent compilation cache makes recompiles
across processes (tests, CLIs, benches) near-free.
"""

from __future__ import annotations

import os

import jax

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it here
    # (before backend init) so `JAX_PLATFORMS=cpu python bench.py ...` works.
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    cache_dir = cache_dir or os.environ.get(
        "SAM2UNET_TPU_CACHE", os.path.expanduser("~/.cache/sam2unet_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
