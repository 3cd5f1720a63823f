"""Pallas bitonic chunk sort vs numpy, and the chunk-sorted counting
path vs host counting (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from km_tpu.ops import encode
from km_tpu.ops.count import count_batches_host, count_chunk_device
from km_tpu.ops.pallas_sort import sort_chunks, sort_chunks_runs, supported


@pytest.mark.parametrize("chunk,n_chunks", [(1024, 1), (4096, 3)])
def test_sort_chunks_matches_numpy(chunk, n_chunks):
    rng = np.random.default_rng(7)
    n = chunk * n_chunks
    # narrow hi range forces plenty of lexicographic ties
    hi = rng.integers(0, 1 << 6, n).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    shi, slo = sort_chunks(jnp.asarray(hi), jnp.asarray(lo), chunk=chunk,
                           interpret=True)
    shi, slo = np.asarray(shi), np.asarray(slo)
    for c in range(n_chunks):
        s = slice(c * chunk, (c + 1) * chunk)
        want = np.sort((hi[s].astype(np.uint64) << 32) | lo[s])
        got = (shi[s].astype(np.uint64) << 32) | slo[s]
        assert (want == got).all()


@pytest.mark.parametrize("chunk,n_chunks", [(1024, 1), (4096, 3)])
def test_sort_chunks_runs_matches_reference(chunk, n_chunks):
    """The fused sort+run-length kernel equals sort_chunks followed by
    runs_from_sorted_chunked (incl. sentinel-run zeroing)."""
    from km_tpu.ops.count import runs_from_sorted_chunked

    rng = np.random.default_rng(9)
    n = chunk * n_chunks
    hi = rng.integers(0, 1 << 4, n).astype(np.uint32)  # heavy ties
    lo = rng.integers(0, 1 << 3, n, dtype=np.uint64).astype(np.uint32)
    # sprinkle sentinel (invalid-window) entries
    sent_at = rng.random(n) < 0.05
    hi[sent_at] = 0xFFFFFFFF
    lo[sent_at] = 0xFFFFFFFF

    fhi, flo, flen = sort_chunks_runs(jnp.asarray(hi), jnp.asarray(lo),
                                      chunk=chunk, interpret=True)
    shi, slo = sort_chunks(jnp.asarray(hi), jnp.asarray(lo), chunk=chunk,
                           interpret=True)
    rhi, rlo, rlen = runs_from_sorted_chunked(shi, slo, chunk)
    rlen = np.where((np.asarray(rhi) == 0xFFFFFFFF)
                    & (np.asarray(rlo) == 0xFFFFFFFF), 0,
                    np.asarray(rlen))
    assert (np.asarray(fhi) == np.asarray(shi)).all()
    assert (np.asarray(flo) == np.asarray(slo)).all()
    assert (np.asarray(flen) == rlen).all()


def test_sort_chunks_supported_predicate():
    assert supported(1 << 20)
    assert not supported(100)  # not a chunk multiple
    assert not supported(3 << 17, chunk=3 << 17)  # not a power of two


@pytest.mark.parametrize("canonical", [True, False])
def test_chunk_sorted_counting_matches_host(canonical):
    """count_chunk_device with the Pallas chunk sort must yield the same
    key->count map as host counting (runs are per-chunk partials)."""
    rng = np.random.default_rng(8)
    k = 21
    n = 6000
    codes = rng.integers(0, 4, n).astype(np.uint8)
    valid = rng.random(n) > 0.02

    fn = jax.jit(count_chunk_device,
                 static_argnames=("k", "canonical", "use_pallas",
                                  "use_pallas_sort", "sort_chunk"))
    hi, lo, cnt = fn(jnp.asarray(codes), jnp.asarray(valid), k=k,
                     canonical=canonical, use_pallas=False,
                     use_pallas_sort=True, sort_chunk=1024)
    hi, lo, cnt = (np.asarray(hi).astype(np.uint64), np.asarray(lo),
                   np.asarray(cnt))
    keep = cnt > 0
    got: dict[int, int] = {}
    for key, c in zip((hi[keep] << 32) | lo[keep], cnt[keep]):
        got[int(key)] = got.get(int(key), 0) + int(c)

    wk, wc = count_batches_host(iter([(codes, valid)]), k,
                                canonical=canonical)
    want = {int(a): int(b) for a, b in zip(wk, wc)}
    assert got == want
