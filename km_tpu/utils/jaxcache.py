"""Persistent XLA compilation cache.

The walk/count kernels take minutes to compile on a TPU backend but are
stable across runs; caching them on disk removes the compile cost from
every later process (measured: 400-target device pipeline cold in a
fresh process ~8 s with a warm cache and healthy device link vs minutes
of remote compiles without — docs/COLDSTART.md has the full breakdown,
including the wedged-link stalls the cache can NOT fix). Cross-process
and cross-entry-point hits are regression-tested in
tests/test_cache_crossprocess.py. Call enable() before the first jit
execution (bench.py and the CLI do).

The cache key is computed from the serialized MLIR module, which embeds
the SOURCE LOCATIONS of every traced frame — including the entry-point
script's path and line numbers. Left alone, that makes the key unstable
across entry points: the CLI, the bench driver, and every test file each
recompile identical kernels from scratch (measured 130-200 s per count
kernel shape on the tunneled TPU). Canonicalizing source paths out of
the HLO and dropping full tracebacks from locations makes the key a
function of the computation alone, so one compile serves every caller."""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "KM_TPU_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "km_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    min_secs = float(os.environ.get("KM_TPU_JAX_CACHE_MIN_S", "1.0"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_secs)
    except Exception:
        return  # older jax: cache unavailable, compile as usual
    try:
        # stabilize the cache key across entry points (see module doc)
        jax.config.update("jax_include_full_tracebacks_in_locations",
                          False)
        jax.config.update("jax_hlo_source_file_canonicalization_regex",
                          ".*")
    except Exception:
        pass  # older jax: keys stay per-entry-point, cache still works
