"""JAX bootstrap: persistent compilation cache + platform helpers.

This environment's compiles are expensive (single-threaded XLA); the
persistent cache makes every second run of a given shape instant. Call
:func:`setup` early from CLIs, benchmarks, and test conftest.
"""

from __future__ import annotations

import os


def setup(cache_dir: str = "") -> None:
    import jax

    cache = cache_dir or os.environ.get("AYOLO_JAX_CACHE", "/root/.cache/jax_comp_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags — cache is best-effort
        pass
