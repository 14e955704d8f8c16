"""Shared JAX configuration: persistent compile cache for the encoder's
device kernels (shapes recur across runs; first-compile is the dominant
startup cost otherwise).  Import before building any jitted kernel."""

from __future__ import annotations

import os


def configure() -> None:
    try:
        import jax

        cache = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
