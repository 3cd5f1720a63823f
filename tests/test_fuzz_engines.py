"""Randomized cross-engine equality: for synthesized samples with
planted variants, the exact sequential engine, the host batch pipeline
and the device batch pipeline must produce byte-identical rows. The
fixture suites pin five real samples; this fuzzes the space around
them (random targets, variant types, positions and mixture ratios)."""

import numpy as np
import pytest

from km_tpu.models.batch import run_catalog
from km_tpu.models.finder import VariantFinder
from km_tpu.models.sequence import TargetSeq
from km_tpu.models.table import CountTable
from km_tpu.ops import count as opcount
from km_tpu.ops.device_table import DeviceCountTable

K = 31
BASES = "ACGT"


def _linear_seq(rng, n):
    while True:
        seq = "".join(BASES[b] for b in rng.integers(0, 4, n))
        if len({seq[i:i + K] for i in range(n - K + 1)}) == n - K + 1:
            return seq


def _mutate(rng, seq):
    kind = rng.choice(["sub", "ins", "del", "dup"])
    p = int(rng.integers(40, len(seq) - 40))
    if kind == "sub":
        repl = BASES[(BASES.index(seq[p]) + 1) % 4]
        return seq[:p] + repl + seq[p + 1:]
    if kind == "ins":
        ins = "".join(BASES[b] for b in rng.integers(0, 4, int(
            rng.integers(1, 8))))
        return seq[:p] + ins + seq[p:]
    if kind == "del":
        d = int(rng.integers(1, 8))
        return seq[:p] + seq[p + d:]
    dup_len = int(rng.integers(4, 20))  # tandem duplication (ITD-like)
    return seq[:p] + seq[p - dup_len:p] + seq[p:]


def _sample_table(rng, seqs, n_reads=500, read_len=60):
    codes_parts, valid_parts = [], []
    for seq in seqs:
        for _ in range(n_reads):
            off = int(rng.integers(0, len(seq) - read_len + 1))
            frag = seq[off:off + read_len]
            codes_parts.append(np.frombuffer(
                frag.translate(str.maketrans("ACGT", "\0\1\2\3"))
                .encode("latin1"), np.uint8))
            valid_parts.append(np.ones(read_len, bool))
            codes_parts.append(np.zeros(1, np.uint8))
            valid_parts.append(np.zeros(1, bool))
    codes = np.concatenate(codes_parts)
    valid = np.concatenate(valid_parts)
    keys, counts = opcount.count_batches_host([(codes, valid)], K,
                                              canonical=True, min_count=2)
    return CountTable.from_arrays(keys, counts, K, True, name="fuzz",
                                  presorted=True)


@pytest.mark.parametrize("seed", [11, 22, 33, 44, 55, 66, 77, 88])
def test_engines_agree_on_random_samples(seed):
    rng = np.random.default_rng(seed)
    targets, tables = [], []
    for t in range(3):
        ref = _linear_seq(rng, int(rng.integers(150, 260)))
        alt = _mutate(rng, ref)
        if t == 2:  # one target carries TWO variants (cluster pressure)
            alt2 = _mutate(rng, ref)
            seqs = [ref, alt, alt2]
        else:
            seqs = [ref, alt]
        targets.append(TargetSeq(ref, "T%d" % t, K))
        tables.append(_sample_table(rng, seqs))

    # one shared table per scenario: merge the three samples
    keys = np.concatenate([t.keys for t in tables])
    counts = np.concatenate([np.asarray(t.counts, np.int64)
                             for t in tables])
    mk, mc = opcount.merge_runs(np.empty(0, np.uint64),
                                np.empty(0, np.int64),
                                keys[np.argsort(keys, kind="stable")],
                                counts[np.argsort(keys, kind="stable")])
    table = CountTable.from_arrays(mk, mc.astype(np.uint32), K, True,
                                   name="fuzz", presorted=True)

    exact = []
    for tgt in targets:
        f = VariantFinder(tgt, table)
        f.find_alt_paths()
        f.quantify_paths()
        f.quantify_clusters()
        exact.append([str(r) for r in f.sorted_rows()])

    host_rows = run_catalog(targets, table, walk="host")
    assert [[str(r) for r in rows] for rows in host_rows] == exact

    dev = DeviceCountTable.from_host(table)
    dev_rows = run_catalog(targets, dev, walk="device")
    assert [[str(r) for r in rows] for rows in dev_rows] == exact
