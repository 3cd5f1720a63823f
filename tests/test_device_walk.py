"""The single-dispatch device walk must reproduce the exact engine's
rows on every fixture (small walklet pool to exercise seed waves and
overflow-retry)."""

import numpy as np
import pytest

from km_tpu.io.fasta import read_target
from km_tpu.models.batch import run_catalog
from km_tpu.models.finder import VariantFinder
from km_tpu.models.sequence import TargetSeq
from km_tpu.models.table import CountTable
from km_tpu.ops.batch_walk import device_discover
from km_tpu.ops.device_table import DeviceCountTable

from helpers import REFDATA

CAT = f"{REFDATA}/catalog/GRCh38"
CASES = [
    ("NPM1_4ins_exons_10-11utr", "02H025_NPM1"),
    ("FLT3-ITD_exons_13-15", "03H116_ITD"),
    ("FLT3-ITD_exons_13-15", "03H112_IandI"),
    ("FLT3-TKD_exon_20", "05H094_FLT3-TKD_del"),
    ("DNMT3A_R882_exon_23", "02H033_DNMT3A_sub"),
]


def _exact_rows(target_name, jf_name):
    table = CountTable.from_jf(f"{REFDATA}/jf/{jf_name}.jf")
    seqs, _ = read_target(f"{CAT}/{target_name}.fa")
    target = TargetSeq("".join(seqs), target_name, table.k)
    finder = VariantFinder(target, table)
    finder.find_alt_paths()
    finder.quantify_paths()
    finder.quantify_clusters()
    return [str(r) for r in finder.sorted_rows()]


def test_device_walk_node_sets_match_exact():
    from km_tpu.models.walk import Walker

    for target_name, jf_name in CASES:
        host = CountTable.from_jf(f"{REFDATA}/jf/{jf_name}.jf")
        dev = DeviceCountTable.from_host(host)
        seqs, _ = read_target(f"{CAT}/{target_name}.fa")
        target = TargetSeq("".join(seqs), target_name, host.k)

        exact = Walker(host, ratio=0.05, count=5).discover(target.ref_mer)
        got = device_discover([target.ref_mer], dev, walklet_cap=256)[0]
        assert set(got) == set(exact), f"{target_name} vs {jf_name}"
        assert got == {k: exact[k] for k in got}  # counts agree


def test_device_walk_rows_match_exact():
    for target_name, jf_name in CASES:
        host = CountTable.from_jf(f"{REFDATA}/jf/{jf_name}.jf")
        dev = DeviceCountTable.from_host(host)
        seqs, _ = read_target(f"{CAT}/{target_name}.fa")
        target = TargetSeq("".join(seqs), target_name, host.k)
        rows = run_catalog([target], dev, walk="device")[0]
        assert [str(r) for r in rows] == _exact_rows(target_name, jf_name)


def test_device_walk_many_targets_small_pool():
    """All 9 catalog targets through one dispatch with a tiny pool,
    forcing many seed waves."""
    import os

    host = CountTable.from_jf(f"{REFDATA}/jf/03H116_ITD.jf")
    dev = DeviceCountTable.from_host(host)
    targets = []
    for fn in sorted(os.listdir(CAT)):
        seqs, _ = read_target(os.path.join(CAT, fn))
        targets.append(TargetSeq("".join(seqs), os.path.splitext(fn)[0],
                                 host.k))
    rows_dev = run_catalog(targets, dev, walk="device")
    rows_host = run_catalog(targets, host, walk="host")
    for a, b in zip(rows_dev, rows_host):
        assert [str(r) for r in a] == [str(r) for r in b]
