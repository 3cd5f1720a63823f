"""Multi-device (virtual 8-CPU mesh) tests: sharded lookups equal host
lookups; all-to-all sharded counting equals host counting."""

import numpy as np
import pytest

import jax

from km_tpu.models.table import CountTable
from km_tpu.ops import encode
from km_tpu.ops.count import count_batches_host
from km_tpu.parallel.sharded_table import (ShardedCountTable, make_mesh,
                                           sharded_count)

from helpers import REFDATA


def _require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def test_sharded_lookup_matches_host():
    _require_devices(8)
    host = CountTable.from_jf(f"{REFDATA}/jf/02H025_NPM1.jf")
    mesh = make_mesh(8)
    sharded = ShardedCountTable(host, mesh)

    rng = np.random.default_rng(3)
    present = host.keys[rng.integers(0, len(host.keys), 300)]
    flipped = encode.revcomp(present, host.k)
    absent = rng.integers(0, 1 << 61, 300, dtype=np.uint64)
    queries = np.concatenate([present, flipped, absent])
    assert (sharded.query_packed(queries) == host.query_packed(queries)).all()


def test_sharded_count_matches_host():
    _require_devices(8)
    rng = np.random.default_rng(4)
    bases = rng.choice(np.frombuffer(b"ACGT", np.uint8), 200_000)
    seq = bases.tobytes().decode()
    k = 21

    def batches():
        codes = encode.seq_to_codes(seq)
        yield codes, np.ones(len(codes), bool)

    hk, hc = count_batches_host(batches(), k, canonical=True, min_count=1)
    mesh = make_mesh(8)
    sk, sc = sharded_count(batches(), mesh, k, canonical=True, min_count=1,
                           chunk=1 << 15)
    assert (hk == sk).all()
    assert (hc.astype(np.int64) == sc.astype(np.int64)).all()


def test_sharded_table_save_load_roundtrip(tmp_path):
    _require_devices(4)
    host = CountTable.from_jf(f"{REFDATA}/jf/02H025_NPM1.jf")
    mesh = make_mesh(4)
    sharded = ShardedCountTable(host, mesh)
    path = str(tmp_path / "table.npz")
    sharded.save(path)

    reloaded = ShardedCountTable.load(path, mesh)
    assert reloaded.k == host.k and reloaded.canonical == host.canonical
    rng = np.random.default_rng(5)
    queries = np.concatenate([
        host.keys[rng.integers(0, len(host.keys), 64)],
        rng.integers(0, 1 << 62, 64, dtype=np.uint64),  # mostly misses
    ])
    assert (reloaded.query_packed(queries) == host.query_packed(queries)).all()

    # the shared on-disk format also round-trips through CountTable
    host2 = CountTable.load(path)
    assert (host2.keys == host.keys).all()
    assert (host2.counts == host.counts).all()
