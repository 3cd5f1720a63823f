"""The fused Pallas window-pack kernel must agree bit-for-bit with the
XLA spec path (pack + revcomp canonicalize + validity sentinel) and,
through count_chunk_device, with host counting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from km_tpu.ops import encode
from km_tpu.ops.count import (canonical_device, count_chunk_device,
                              count_batches_host, pack_windows_device)
from km_tpu.ops.device_table import revcomp_split
from km_tpu.ops.pallas_pack import (BLOCK_ROWS, LANES, SENTINEL32,
                                    pack_canonical_windows, supported)

N = BLOCK_ROWS * LANES * 2  # two grid blocks


def _xla_reference(codes, valid, k, canonical):
    c32 = jnp.asarray(codes).astype(jnp.int32).astype(jnp.uint32)
    hi, lo = pack_windows_device(c32, k)
    if canonical:
        rhi, rlo = revcomp_split(hi, lo, k)
        hi, lo = canonical_device(hi, lo, rhi, rlo)
    cnt = np.concatenate([[0], np.cumsum(valid)])
    wv = (cnt[k:] - cnt[:-k]) == k
    return (np.where(wv, np.asarray(hi), SENTINEL32),
            np.where(wv, np.asarray(lo), SENTINEL32))


@pytest.mark.parametrize("k,canonical", [(31, True), (31, False),
                                         (16, True), (21, True)])
def test_pallas_pack_matches_xla(k, canonical):
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, N, dtype=np.uint8)
    valid = rng.random(N) > 0.02

    interpret = jax.default_backend() == "cpu"
    hi, lo = pack_canonical_windows(jnp.asarray(codes), jnp.asarray(valid),
                                    k=k, canonical=canonical,
                                    interpret=interpret)
    hi, lo = np.asarray(hi), np.asarray(lo)
    exp_hi, exp_lo = _xla_reference(codes, valid, k, canonical)
    nw = N - k + 1
    assert (hi[:nw] == exp_hi).all()
    assert (lo[:nw] == exp_lo).all()
    # windows running off the end are sentinels
    assert (hi[nw:] == SENTINEL32).all()
    assert (lo[nw:] == SENTINEL32).all()


def test_count_chunk_pallas_matches_host():
    rng = np.random.default_rng(4)
    k = 31
    codes = rng.integers(0, 4, N, dtype=np.uint8)
    valid = np.ones(N, dtype=bool)
    assert supported(N, k)

    hi, lo, cnt = jax.jit(
        count_chunk_device, static_argnames=("k", "canonical", "use_pallas")
    )(jnp.asarray(codes), jnp.asarray(valid), k=k, canonical=True,
      use_pallas=True)
    hi = np.asarray(hi).astype(np.uint64)
    lo = np.asarray(lo).astype(np.uint64)
    cnt = np.asarray(cnt)
    keep = cnt > 0
    keys = (hi[keep] << np.uint64(32)) | lo[keep]

    hk, hc = count_batches_host([(codes, valid)], k)
    assert (np.sort(keys) == hk).all()
    order = np.argsort(keys, kind="stable")
    assert (cnt[keep][order] == hc).all()
