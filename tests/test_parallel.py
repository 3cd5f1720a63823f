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


def test_routed_lookup_matches_host_and_broadcast():
    """SURVEY §2.3 routed gather: owner-routed lookups must equal both
    the broadcast path and the host table, hits and misses alike."""
    _require_devices(8)
    host = CountTable.from_jf(f"{REFDATA}/jf/02H025_NPM1.jf")
    mesh = make_mesh(8)
    sharded = ShardedCountTable(host, mesh)

    rng = np.random.default_rng(7)
    present = host.keys[rng.integers(0, len(host.keys), 500)]
    flipped = encode.revcomp(present, host.k)
    absent = rng.integers(0, 1 << 61, 500, dtype=np.uint64)
    edge = np.concatenate([host.keys[:1], host.keys[-1:],
                           sharded.boundaries[sharded.boundaries <
                                              np.uint64(1 << 62)]])
    queries = np.concatenate([present, flipped, absent, edge])
    want = host.query_packed(queries)
    assert (sharded.query_packed(queries, routed=True) == want).all()
    assert (sharded.query_packed(queries, routed=False) == want).all()


def test_routed_lookup_overflow_falls_back_to_broadcast():
    """A bucket capacity far below the skew (cap=1) must not produce
    wrong counts: the dropped-query report triggers the broadcast
    fallback."""
    import jax.numpy as jnp

    from km_tpu.ops.device_table import split_keys

    _require_devices(8)
    host = CountTable.from_jf(f"{REFDATA}/jf/02H025_NPM1.jf")
    sharded = ShardedCountTable(host, make_mesh(8))
    rng = np.random.default_rng(8)
    queries = host.keys[rng.integers(0, len(host.keys), 400)]
    hi, lo = split_keys(queries)
    out = sharded.lookup_routed(jnp.asarray(hi), jnp.asarray(lo), cap=1)
    want = host.query_packed(queries)
    assert (np.asarray(out).astype(np.int64) == want).all()


def test_full_step_routed_lookups_match_host():
    """The 2-D-mesh pipeline step's routed tip lookups (step 4) agree
    with a host recomputation, and nothing overflowed the routing
    buckets."""
    import jax.numpy  # noqa: F401  (ensures jax configured first)

    from jax.sharding import Mesh

    from km_tpu.parallel.pipeline_step import demo_step

    _require_devices(8)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("reads", "shard"))
    out = demo_step(mesh, k=31, chunk=2048, queries_per_row=128)
    (dhi, dlo, dcnt, tips, child_mask, dropped, qdropped) = out
    assert int(np.asarray(qdropped).sum()) == 0
    assert tips.shape == (2, 128)
    assert child_mask.shape == (2, 128, 4)

    # host recomputation of step 4 from demo_step's own constructions
    rng = np.random.default_rng(0)
    _ = rng.integers(0, 4, (2, 4, 2048), dtype=np.uint8)
    _ = np.ones((2, 4, 2048), dtype=bool)
    keys = np.unique(rng.integers(0, 1 << 62, 1 << 12, dtype=np.uint64))
    counts = rng.integers(1, 100, len(keys))
    q = rng.integers(0, 1 << 62, (2, 128), dtype=np.uint64)
    qc = encode.canonical(q.reshape(-1), 31).reshape(q.shape)
    pos = np.searchsorted(keys, qc)
    posc = np.minimum(pos, len(keys) - 1)
    want = np.where(keys[posc] == qc, counts[posc], 0)
    assert (tips.astype(np.int64) == want).all()


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


def test_counting_deterministic_under_partitioning():
    """The race-sensitive piece of the design is accumulation into the
    sharded table; merging is associative, so results must be identical
    no matter how reads are partitioned into batches or devices."""
    _require_devices(8)
    rng = np.random.default_rng(11)
    seq = "".join(rng.choice(list("ACGT"), 6000))
    k = 21
    codes = encode.seq_to_codes(seq)
    valid = np.ones(len(codes), bool)

    def as_batches(n_pieces):
        # split with k-1 overlap so every window survives partitioning
        cuts = np.linspace(0, len(codes), n_pieces + 1).astype(int)
        for a, b in zip(cuts[:-1], cuts[1:]):
            lo = max(0, a - (k - 1)) if a else 0
            yield codes[lo:b], valid[lo:b]

    # NB: naive re-batching double-counts boundary windows; use one
    # stream but different device/chunk partitionings instead
    mesh8 = make_mesh(8)
    mesh2 = make_mesh(2)
    k1, c1 = sharded_count([(codes, valid)], mesh8, k, chunk=1 << 10)
    k2, c2 = sharded_count([(codes, valid)], mesh2, k, chunk=1 << 12)
    assert (k1 == k2).all() and (c1 == c2).all()


def test_bucket_cap_overflow_retries_to_correct_counts():
    """Force the exchange buckets to overflow: an A/C-only read keeps
    every canonical k-mer in the bottom quarter of key space (revcomp
    would start with G/T and lose the min), so two of four owner shards
    receive hundreds of distinct runs — far past a tiny bucket_cap.
    sharded_count must detect the dropped runs, double the cap, and
    still converge to the host counts."""
    _require_devices(4)
    k = 21
    rng = np.random.default_rng(12)
    seq = "".join(rng.choice(list("AC"), 3000))
    codes = encode.seq_to_codes(seq)
    valid = np.ones(len(codes), bool)

    def batches():
        yield codes, valid

    hk, hc = count_batches_host(batches(), k, canonical=True, min_count=1)
    mesh = make_mesh(4)
    sk, sc = sharded_count(batches(), mesh, k, canonical=True,
                           min_count=1, chunk=1 << 10, bucket_cap=4)
    assert (hk == sk).all()
    assert (hc.astype(np.int64) == sc.astype(np.int64)).all()


def test_distributed_single_host_noop_and_mesh():
    from km_tpu.parallel import distributed

    distributed.initialize()  # no coordinator configured -> no-op
    mesh = distributed.global_mesh()
    assert mesh.shape["shard"] == len(jax.devices())
    mesh2 = distributed.global_mesh(reads_axis="reads", reads=2)
    assert mesh2.shape["reads"] == 2
    files = [f"f{i}" for i in range(5)]
    assert distributed.local_read_shards(files) == files  # 1 process
