"""Native (C++) parser/counter vs the pure-Python reference paths."""

import numpy as np
import pytest

from km_tpu import native
from km_tpu.io.fastq import read_batches
from km_tpu.ops import encode
from km_tpu.ops.count import count_batches_host

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def _write_fastq(path, rng, n_reads=500, read_len=100):
    with open(path, "w") as f:
        for i in range(n_reads):
            seq = "".join(rng.choice(list("ACGTN"), read_len,
                                     p=[0.24, 0.24, 0.24, 0.24, 0.04]))
            qual = "".join(chr(int(q)) for q in
                           rng.integers(33, 74, read_len))
            f.write(f"@read{i}\n{seq}\n+\n{qual}\n")


def _concat(batches):
    cs, vs = [], []
    for c, v in batches:
        cs.append(c)
        vs.append(v)
    return np.concatenate(cs), np.concatenate(vs)


def test_native_parse_equals_python(tmp_path):
    rng = np.random.default_rng(11)
    fq = str(tmp_path / "reads.fq")
    _write_fastq(fq, rng)
    for q in (None, "5", "A"):
        c1, v1 = _concat(read_batches([fq], min_quality=q,
                                      prefer_native=False))
        c2, v2 = _concat(read_batches([fq], min_quality=q,
                                      prefer_native=True))
        # streams must yield identical k-mer multisets; compare counts
        k = 21
        k1, n1 = count_batches_host(iter([(c1, v1)]), k)
        k2, n2 = count_batches_host(iter([(c2, v2)]), k)
        assert (k1 == k2).all() and (n1 == n2).all()


def test_native_parse_chunked_boundaries(tmp_path):
    rng = np.random.default_rng(12)
    fq = str(tmp_path / "reads.fq")
    _write_fastq(fq, rng, n_reads=300, read_len=150)
    big = _concat(read_batches([fq], prefer_native=True, batch_bases=1 << 26))
    # tiny chunks force record carry-over between buffers
    small = _concat(read_batches([fq], prefer_native=False))
    k = 31
    kb, nb = count_batches_host(iter([big]), k)
    ks, ns = count_batches_host(iter([small]), k)
    assert (kb == ks).all() and (nb == ns).all()


def test_native_count_host_matches_python():
    rng = np.random.default_rng(13)
    codes = rng.integers(0, 4, 30_000).astype(np.uint8)
    valid = rng.random(30_000) > 0.02
    for k in (15, 31):
        for canonical in (True, False):
            nk, nc = native.count_host(codes, valid, k, canonical)
            pk, pc = count_batches_host(iter([(codes, valid)]), k,
                                        canonical=canonical)
            assert (nk == pk).all()
            assert (nc.astype(np.int64) == pc.astype(np.int64)).all()


def test_native_fasta_parse(tmp_path):
    fa = str(tmp_path / "seqs.fa")
    with open(fa, "w") as f:
        f.write(">s1\nACGTACGTAC\nGGTT\n>s2\nTTTTCCCC\n")
    c, v = _concat(read_batches([fa], prefer_native=True))
    k = 6
    kk, nn = count_batches_host(iter([(c, v)]), k, canonical=False)
    got = {encode.unpack_kmer(int(x), k) for x in kk}
    assert "ACGTAC" in got
    assert "TACGGT" in got  # spans the intra-record line break
    assert "GGTTTT" not in got  # must not span s1|s2


def test_native_dijkstra_matches_numpy_sweep():
    """The native scan-min sweep must be step-for-step identical to the
    pure-numpy fallback (same float32 math, same lowest-index ties)."""
    from km_tpu.models.pathfinder import OverlapGraph

    rng = np.random.default_rng(14)
    for trial in range(20):
        n_real = int(rng.integers(2, 120))
        g = OverlapGraph.__new__(OverlapGraph)
        g.n_real = n_real
        g.n = n_real + 2
        g.first_node, g.last_node = n_real, n_real + 1
        g._src, g._dst, g._w = [], [], []
        # random sparse digraph with km-like weights (many exact ties)
        m = int(rng.integers(1, 6 * n_real))
        src = rng.integers(0, g.n, m)
        dst = rng.integers(0, g.n, m)
        keep = src != dst
        for a, b in zip(src[keep], dst[keep]):
            g.set_edge(int(a), int(b), float(rng.choice([1.0, 0.01])))
        g.set_edge(g.first_node, 0, 0.01)
        g.set_edge(1 % g.n_real, g.last_node, 0.01)
        g.freeze()
        for start in (g.first_node, g.last_node, 0):
            got = native.dijkstra_scanmin(g.succ_ptr, g.succ_ids,
                                          g.succ_w, g.n, start)
            want = _numpy_sweep(g, start)
            assert (got == want).all(), (trial, start)


def _numpy_sweep(g, start):
    """Copy of the pure-numpy fallback in OverlapGraph._sweep."""
    ptr, ids_flat, w_flat = g.succ_ptr, g.succ_ids, g.succ_w
    n = g.n
    prev = np.full(n, -1, dtype=np.int32)
    dist = np.full(n, np.inf, dtype=np.float32)
    dist[start] = 0
    work = dist.copy()
    for _ in range(n):
        i = int(work.argmin())
        work[i] = np.inf
        lo, hi = ptr[i], ptr[i + 1]
        if hi > lo:
            ids = ids_flat[lo:hi]
            ndist = w_flat[lo:hi] + dist[i]
            better = ndist < dist[ids]
            if better.any():
                upd = ids[better]
                nd = ndist[better]
                dist[upd] = nd
                work[upd] = nd
                prev[upd] = i
    return prev


def test_native_merge_sorted_runs():
    rng = np.random.default_rng(15)
    runs = []
    want: dict[int, int] = {}
    for _ in range(7):
        keys = np.unique(rng.integers(0, 500, rng.integers(1, 80),
                                      dtype=np.uint64))
        counts = rng.integers(1, 9, len(keys)).astype(np.int64)
        runs.append((keys, counts))
        for k_, c in zip(keys, counts):
            want[int(k_)] = want.get(int(k_), 0) + int(c)
    runs.append((np.empty(0, np.uint64), np.empty(0, np.int64)))  # empty run
    mk, mc = native.merge_sorted_runs(runs)
    assert list(mk) == sorted(want)
    assert {int(a): int(b) for a, b in zip(mk, mc)} == want
    assert (np.diff(mk.astype(np.int64)) > 0).all()
