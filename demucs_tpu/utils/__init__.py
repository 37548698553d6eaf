"""Utilities: progress callbacks, profiling, compile-cache setup."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache.

    The full segment graph takes minutes to compile on tunneled TPU
    backends; the cache makes every later process start in seconds.
    Called by the CLI, the HTTP server and bench.py; library users can
    call it themselves (idempotent).
    """
    import jax

    cache = path or os.environ.get("DEMUCS_TPU_CACHE", "/tmp/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
