"""Counting correctness: device sort+segment-reduce counting equals host
counting; FASTQ batching respects read boundaries, N bases and quality
filters; min_count thresholding matches the jellyfish -L recipe."""

import numpy as np

from km_tpu.io.fastq import read_batches
from km_tpu.models.table import CountTable
from km_tpu.ops import encode
from km_tpu.ops.count import (count_batches_device, count_batches_host,
                              window_valid)


def _random_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def test_device_matches_host_counting():
    rng = np.random.default_rng(7)
    seq = _random_seq(rng, 50_000)
    k = 25

    def batches():
        codes = encode.seq_to_codes(seq)
        yield codes, np.ones(len(codes), bool)

    hk, hc = count_batches_host(batches(), k)
    dk, dc = count_batches_device(batches(), k, chunk=1 << 13)
    assert (hk == dk).all()
    assert (hc == dc).all()


def test_counts_match_direct_table():
    rng = np.random.default_rng(8)
    seqs = [_random_seq(rng, 200) for _ in range(50)]
    k = 15

    def batches():
        for s in seqs:
            codes = encode.seq_to_codes(s)
            yield codes, np.ones(len(codes), bool)

    dk, dc = count_batches_device(batches(), k, chunk=1 << 10)
    ref = CountTable.from_sequences(seqs, k, canonical=True)
    assert (dk == ref.keys).all()
    assert (dc == ref.counts).all()


def test_window_valid():
    valid = np.array([1, 1, 1, 0, 1, 1, 1, 1], dtype=bool)
    assert (window_valid(valid, 3) == [True, False, False, False, True,
                                       True]).all()


def test_read_batches_boundaries(tmp_path):
    fq = tmp_path / "r.fq"
    fq.write_text("@r1\nACGTACGT\n+\nIIIIIIII\n@r2\nTTTTGGGG\n+\nIIII!!II\n")
    batches = list(read_batches([str(fq)], min_quality="5"))
    codes, valid = batches[0]
    # separator between reads
    assert not valid[8]
    # low-quality ('!') bases invalidated
    assert not valid[9 + 4] and not valid[9 + 5]
    k = 4

    def b():
        yield codes, valid

    keys, counts = count_batches_host(b(), k, canonical=False)
    got = {encode.unpack_kmer(int(x), k): int(c) for x, c in zip(keys, counts)}
    assert "ACGT" in got and got["ACGT"] == 2
    assert "CGTA" in got
    assert "TTTT" in got  # first r2 window, all high quality
    assert "GTTT" not in got  # would span the r1|r2 boundary
    assert "TTTG" not in got  # includes a low-quality G


def test_min_count_filter():
    seqs = ["ACGTACGTAC", "ACGTACGTAC", "TTTTTTTCCA"]

    def batches():
        for s in seqs:
            codes = encode.seq_to_codes(s)
            yield codes, np.ones(len(codes), bool)

    k1, _ = count_batches_host(batches(), 8, canonical=False, min_count=2)
    k2, _ = count_batches_host(batches(), 8, canonical=False, min_count=1)
    assert len(k1) < len(k2)
    name = encode.pack_kmer("ACGTACGT")
    assert name in k1


def test_stream_matches_host_counting():
    """The streaming device accumulator (one fused dispatch per chunk,
    readback only at the end) must equal host counting exactly,
    including across chunk boundaries and with repeated k-mers."""
    from km_tpu.ops.count import count_batches_device_stream

    rng = np.random.default_rng(11)
    ref = _random_seq(rng, 4_000)
    # reads sampled from a reference so k-mers repeat
    reads = [ref[o:o + 100]
             for o in rng.integers(0, len(ref) - 100, 300)]
    k = 21

    def batches():
        for s in reads:
            codes = encode.seq_to_codes(s)
            yield codes, np.ones(len(codes), bool)

    hk, hc = count_batches_host(batches(), k)
    sk, sc = count_batches_device_stream(batches(), k, chunk=1 << 12,
                                         capacity=1 << 13)
    assert (hk == sk).all()
    assert (hc == sc).all()


def test_stream_min_count_and_quality():
    from km_tpu.ops.count import count_batches_device_stream

    rng = np.random.default_rng(12)
    ref = _random_seq(rng, 1_000)
    reads = [ref[o:o + 60] for o in rng.integers(0, len(ref) - 60, 80)]
    k = 17

    def batches():
        for s in reads:
            codes = encode.seq_to_codes(s)
            valid = np.ones(len(codes), bool)
            valid[::13] = False  # simulate low-quality bases
            yield codes, valid

    hk, hc = count_batches_host(batches(), k, min_count=2)
    sk, sc = count_batches_device_stream(batches(), k, min_count=2,
                                         chunk=1 << 11,
                                         capacity=1 << 12)
    assert (hk == sk).all()
    assert (hc == sc).all()


def test_stream_capacity_overflow_raises():
    from km_tpu.ops.count import (CountCapacityOverflow,
                                  count_batches_device_stream)

    rng = np.random.default_rng(13)
    seq = _random_seq(rng, 3_000)  # nearly all 21-mers distinct

    def batches():
        codes = encode.seq_to_codes(seq)
        yield codes, np.ones(len(codes), bool)

    try:
        count_batches_device_stream(batches(), 21, chunk=1 << 11,
                                    capacity=256)
    except CountCapacityOverflow as e:
        assert e.capacity == 256
    else:
        raise AssertionError("expected CountCapacityOverflow")


def test_compact_path_equals_host():
    """count_batches_device_compact (2-bit upload, device compaction,
    sliced readback) must produce the exact host table."""
    import numpy as np

    from km_tpu.ops import count as opcount

    rng = np.random.default_rng(5)
    n = 1 << 16
    codes = rng.integers(0, 4, n, dtype=np.uint8)
    valid = rng.random(n) > 0.02  # some broken positions
    host = opcount.count_batches_host([(codes, valid)], 31,
                                      canonical=True, min_count=1)
    comp = opcount.count_batches_device_compact(
        [(codes, valid)], 31, canonical=True, min_count=1,
        chunk=1 << 14)  # force several chunks + host merge
    assert np.array_equal(comp[0], host[0])
    assert np.array_equal(np.asarray(comp[1], np.int64),
                          np.asarray(host[1], np.int64))
    # min_count filtering parity too
    host2 = opcount.count_batches_host([(codes, valid)], 31,
                                       canonical=True, min_count=2)
    comp2 = opcount.count_batches_device_compact(
        [(codes, valid)], 31, canonical=True, min_count=2,
        chunk=1 << 14)
    assert np.array_equal(comp2[0], host2[0])


def test_coalesce_batches_no_cross_batch_windows():
    """Batches joined into slabs must not create windows spanning two
    batches (the k-1 invalid separator): counts equal counting each
    batch independently."""
    import numpy as np

    from km_tpu.ops import count as opcount

    rng = np.random.default_rng(9)
    batches = [(rng.integers(0, 4, 500, dtype=np.uint8),
                np.ones(500, bool)) for _ in range(6)]
    host = opcount.count_batches_host(
        [(c.copy(), v.copy()) for c, v in batches], 31,
        canonical=True, min_count=1)
    comp = opcount.count_batches_device_compact(
        iter(batches), 31, canonical=True, min_count=1, chunk=1 << 12)
    assert np.array_equal(comp[0], host[0])
    assert np.array_equal(np.asarray(comp[1], np.int64),
                          np.asarray(host[1], np.int64))
