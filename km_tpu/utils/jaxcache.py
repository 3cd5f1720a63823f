"""Persistent XLA compilation cache.

The walk/count kernels take minutes to compile on a TPU backend but are
stable across runs; caching them on disk makes every process after the
first start in seconds. Call enable() before the first jit execution
(bench.py and the CLI do)."""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "KM_TPU_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "km_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax: cache unavailable, compile as usual
