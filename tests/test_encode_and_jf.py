"""Unit tests: 2-bit packing, reverse complement, canonicalization, .jf
decoding, CountTable queries and child expansion."""

import numpy as np
import pytest

from km_tpu.io.jf import read_jf
from km_tpu.models.table import CountTable
from km_tpu.ops import encode

from helpers import REFDATA


def test_pack_unpack_roundtrip():
    seq = "ACGTTGCACCAGTCAGATTTGCAGGCATACG"
    key = encode.pack_kmer(seq)
    assert encode.unpack_kmer(key, len(seq)) == seq


def test_pack_windows():
    seq = "ACGTAC"
    keys = encode.pack_kmers(seq, 3)
    assert [encode.unpack_kmer(k, 3) for k in keys] == \
        ["ACG", "CGT", "GTA", "TAC"]


def test_revcomp():
    seq = "ACGTTGCACCAGTCAGATTTGCAGGCATACG"
    rc = seq.translate(str.maketrans("ACGT", "TGCA"))[::-1]
    keys = np.array([encode.pack_kmer(seq)], dtype=np.uint64)
    assert encode.unpack_kmer(int(encode.revcomp(keys, 31)[0]), 31) == rc
    # involution
    assert int(encode.revcomp(encode.revcomp(keys, 31), 31)[0]) == int(keys[0])


def test_revcomp_short_k():
    for k in (1, 2, 5, 16, 17, 32):
        rng = np.random.default_rng(k)
        seqs = ["".join(rng.choice(list("ACGT"), k)) for _ in range(10)]
        keys = np.array([encode.pack_kmer(s) for s in seqs], dtype=np.uint64)
        rcs = encode.revcomp(keys, k)
        for s, r in zip(seqs, rcs):
            expect = s.translate(str.maketrans("ACGT", "TGCA"))[::-1]
            assert encode.unpack_kmer(int(r), k) == expect


def test_canonical_is_min():
    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("ACGT"), 31)) for _ in range(50)]
    keys = np.array([encode.pack_kmer(s) for s in seqs], dtype=np.uint64)
    canon = encode.canonical(keys, 31)
    for s, c in zip(seqs, canon):
        rc = s.translate(str.maketrans("ACGT", "TGCA"))[::-1]
        assert encode.unpack_kmer(int(c), 31) == min(s, rc)


def test_jf_reader_fixture():
    data = read_jf(f"{REFDATA}/jf/02H025_NPM1.jf")
    assert data.k == 31
    assert data.canonical
    assert len(data.keys) == 1938
    assert data.counts.max() > 0
    # keys are already canonical in a canonical table
    assert (encode.canonical(data.keys, 31) == data.keys).all()


def test_query_vs_bruteforce():
    t = CountTable.from_jf(f"{REFDATA}/jf/02H033_DNMT3A_sub.jf")
    # every stored key must be found under both orientations
    for key in t.keys[:50]:
        seq = encode.unpack_kmer(int(key), t.k)
        rc = seq.translate(str.maketrans("ACGT", "TGCA"))[::-1]
        assert t.query(seq) == t.query(rc) > 0
    assert t.query("A" * 31) == 0


def test_children_threshold_grouping():
    t = CountTable.from_sequences(["ACGTACGGTTCAA" * 5], k=5, canonical=False)
    key = encode.pack_kmer("ACGTA")
    kids = t.get_child_keys(key, cutoff=0.05, n_cutoff=1)
    assert encode.pack_kmer("CGTAC") in kids


def test_count_table_save_load(tmp_path):
    t = CountTable.from_jf(f"{REFDATA}/jf/02H033_DNMT3A_sub.jf")
    p = str(tmp_path / "t.npz")
    t.save(p)
    t2 = CountTable.load(p)
    assert t2.k == t.k and t2.canonical == t.canonical
    assert (t2.keys == t.keys).all() and (t2.counts == t.counts).all()


def test_jf_writer_roundtrip(tmp_path):
    """write_jf emits a binary/sorted file our reader decodes identically."""
    from km_tpu.io.jf import write_jf

    t = CountTable.from_jf(f"{REFDATA}/jf/02H025_NPM1.jf")
    p = str(tmp_path / "rt.jf")
    write_jf(p, t.keys, t.counts, t.k, t.canonical)
    t2 = CountTable.from_jf(p)
    assert t2.k == t.k and t2.canonical == t.canonical
    assert (t2.keys == t.keys).all() and (t2.counts == t.counts).all()
    # header geometry follows Jellyfish's own conventions: r hash bits
    # = log2(size), an r-by-key_len matrix, records ascending by hash
    from km_tpu.io.jf import jf_hash

    data = read_jf(p)
    assert data.header["format"] == "binary/sorted"
    m = data.header["matrix1"]
    assert m["c"] == 2 * t.k
    assert m["r"] == data.header["size"].bit_length() - 1
    assert len(m["columns"]) == 2 * t.k
    h = jf_hash(data.keys, m["columns"], m["c"])
    assert (h[1:] >= h[:-1]).all()


def test_fixture_jf_files_are_matrix_hash_ordered():
    """The validating emulation of Jellyfish's sorted layout: every
    bundled fixture's record order is ascending under jf_hash with the
    file's own matrix1 — the invariant write_jf reproduces and
    Jellyfish's binary-search query path relies on."""
    from km_tpu.io.jf import jf_hash, read_jf as _read_jf

    for name in ("02H025_NPM1", "03H116_ITD", "03H112_IandI",
                 "05H094_FLT3-TKD_del", "02H033_DNMT3A_sub"):
        d = _read_jf(f"{REFDATA}/jf/{name}.jf")
        m = d.header["matrix1"]
        assert m["r"] == d.header["size"].bit_length() - 1, name
        h = jf_hash(d.keys, m["columns"], m["c"])
        assert (h[1:] >= h[:-1]).all(), name
        # keys are NOT lexicographically sorted — the hash order is real
        assert not (d.keys[1:] >= d.keys[:-1]).all(), name


def test_jf_writer_wide_counts(tmp_path):
    """counts above 32 bits widen counter_len instead of truncating."""
    from km_tpu.io.jf import read_header, write_jf

    keys = np.array([5, 9, 21], dtype=np.uint64)
    counts = np.array([1, 2, 1 << 33], dtype=np.uint64)
    p = str(tmp_path / "wide.jf")
    write_jf(p, keys, counts, k=31, canonical=True)
    hdr = read_header(p)
    assert hdr["counter_len"] == 5
    d = read_jf(p)
    assert sorted(d.keys) == [5, 9, 21]
    assert int(d.counts[list(d.keys).index(21)]) == 1 << 33


def test_count_table_save_jf_pipeline(tmp_path):
    """CountTable.save('.jf') output feeds find_mutation like any .jf."""
    from km_tpu.tools.find_mutation import load_table

    t = CountTable.from_jf(f"{REFDATA}/jf/03H116_ITD.jf")
    p = str(tmp_path / "saved.jf")
    t.save(p)
    t2 = load_table(p)
    assert (t2.keys == t.keys).all() and (t2.counts == t.counts).all()
