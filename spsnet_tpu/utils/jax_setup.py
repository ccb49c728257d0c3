"""Process-level JAX setup: persistent compilation cache.

First compile of the full IA-SSD program is ~1-3 min; the cache drops repeat
launches to seconds. Call early in every CLI entry point.
"""
from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None):
    import jax
    cache_dir = cache_dir or os.environ.get(
        'JAX_COMPILATION_CACHE_DIR', '/tmp/spsnet_tpu_jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
