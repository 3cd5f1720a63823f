"""Batched device NNLS (ops.nnls) vs the host spec (models.quant).

The acceptance bar is the report contract: the %.3f/%.1f-rounded row
fields must be byte-identical whether quantification ran per-problem on
host float64 or batched on device float32."""

import os

import numpy as np
import pytest

from km_tpu.io.fasta import read_target
from km_tpu.models import quant
from km_tpu.models.finder import VariantFinder
from km_tpu.models.sequence import TargetSeq
from km_tpu.models.table import CountTable
from km_tpu.ops import nnls

from helpers import REFDATA

FIXTURES = [
    ("02H025_NPM1.jf", "NPM1_4ins_exons_10-11utr.fa"),
    ("02H033_DNMT3A_sub.jf", "DNMT3A_R882_exon_23.fa"),
    ("03H112_IandI.jf", "FLT3-ITD_exons_13-15.fa"),
    ("03H116_ITD.jf", "FLT3-ITD_exons_13-15.fa"),
    ("05H094_FLT3-TKD_del.jf", "FLT3-TKD_exon_20.fa"),
]


def _finder(jf, fa):
    tab = CountTable.from_jf(os.path.join(REFDATA, "jf", jf))
    seqs, _ = read_target(os.path.join(REFDATA, "catalog/GRCh38", fa))
    t = TargetSeq("".join(seqs), os.path.splitext(fa)[0], tab.k)
    f = VariantFinder(t, tab)
    f.find_alt_paths()
    return f


@pytest.mark.parametrize("jf,fa", FIXTURES)
def test_rows_byte_identical(jf, fa):
    f = _finder(jf, fa)
    f.quantify_paths()
    f.quantify_clusters()
    host_rows = [str(r) for r in f.sorted_rows()]
    assert host_rows

    f.rows = []
    jobs = f.quant_jobs()
    sols = nnls.solve_batch([(paths, f.counts) for paths, _, _ in jobs])
    for (_, emit, _), (coef, rvaf) in zip(jobs, sols):
        emit(coef, rvaf)
    assert [str(r) for r in f.sorted_rows()] == host_rows


def test_all_problems_one_dispatch():
    """Every problem of every fixture target in ONE padded batch still
    matches the per-problem host spec."""
    finders = [_finder(jf, fa) for jf, fa in FIXTURES]
    jobs, emits = [], []
    for f in finders:
        for paths, emit, _prewarm in f.quant_jobs():
            jobs.append((paths, f.counts))
            emits.append(emit)
    for emit, (coef, rvaf) in zip(emits, nnls.solve_batch(jobs)):
        emit(coef, rvaf)
    got = [[str(r) for r in f.sorted_rows()] for f in finders]

    want = []
    for jf, fa in FIXTURES:
        f = _finder(jf, fa)
        f.quantify_paths()
        f.quantify_clusters()
        want.append([str(r) for r in f.sorted_rows()])
    assert got == want


def test_zero_counts_guard():
    """All-zero fits keep rVAF at zero (no division by the zero sum)."""
    paths = [(0, 1), (1, 2)]
    counts = [0, 0, 0, 0]
    (coef, rvaf), = nnls.solve_batch([(paths, counts)])
    assert np.all(coef == 0) and np.all(rvaf == 0)

    c2, r2 = quant.quantify(paths, counts)
    assert np.all(c2 == 0) and np.all(r2 == 0)


def test_random_problems_match_spec():
    """Random small NNLS problems: formatted %.3f/%.1f fields match the
    sequential float64 spec (the report contract) problem-for-problem."""
    rng = np.random.default_rng(7)
    problems = []
    for _ in range(20):
        n = int(rng.integers(8, 60))
        n_paths = int(rng.integers(2, 5))
        paths = []
        for _p in range(n_paths):
            ln = int(rng.integers(2, n))
            start = int(rng.integers(0, n - ln + 1))
            paths.append(tuple(range(start, start + ln)))
        counts = rng.integers(0, 3000, n).tolist()
        problems.append((paths, counts))

    sols = nnls.solve_batch(problems)
    for (paths, counts), (coef, rvaf) in zip(problems, sols):
        hcoef, hrvaf = quant.quantify(paths, counts)
        assert ["%.1f" % c for c in coef] == ["%.1f" % c for c in hcoef]
        assert ["%.3f" % r for r in rvaf] == ["%.3f" % r for r in hrvaf]
