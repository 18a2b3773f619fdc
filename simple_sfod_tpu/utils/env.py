"""Process-level environment setup shared by every entry point.

XLA compiles over the axon TPU tunnel take tens of minutes for the big
detector graphs; the persistent compilation cache makes them one-time per
machine. Must be imported before jax initialises."""

from __future__ import annotations

import os


def setup_cache(cache_dir: str = "/tmp/jax_cache"):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
