"""Golden tests for linear_kmin and min_cov, plus target-validity checks
(values from km/tests/test_main.py:555-652)."""

from argparse import Namespace

import pytest

from km_tpu.models.sequence import target_kmers
from km_tpu.tools.linear_kmin import main_linear_kmin
from km_tpu.tools.min_cov import main_min_cov

from helpers import REFDATA, run_tool

CATALOG = f"{REFDATA}/catalog/GRCh38"


def test_duplicate_kmer_raises():
    with pytest.raises(ValueError):
        target_kmers("A" * 32, "not_linear", 31)


def test_linear_kmin_flt3():
    args = Namespace(start=5, target_fn=[f"{CATALOG}/FLT3-ITD_exons_13-15.fa"])
    out, _ = run_tool(main_linear_kmin, args)
    assert out.split("\n")[1].split("\t")[1] == "10"


def test_linear_kmin_all_catalog():
    args = Namespace(start=10, target_fn=[CATALOG])
    out, _ = run_tool(main_linear_kmin, args)
    rows = [l for l in out.split("\n")[1:] if l]
    assert len(rows) == 9
    for r in rows:
        assert int(r.split("\t")[1]) >= 10


def test_min_cov_golden():
    args = Namespace(jellyfish_fn=[f"{REFDATA}/jf/"],
                     target_fn=f"{CATALOG}/FLT3-ITD_exons_13-15.fa")
    out, _ = run_tool(main_min_cov, args)
    got = {}
    for line in out.split("\n")[1:]:
        if line:
            tok = line.split("\t")
            got[tok[0].split("/")[-1]] = tok[1:]
    assert got["02H025_NPM1.jf"] == ["0", "345", "0", "0", "0.00", "315", "315"]
    assert got["03H112_IandI.jf"] == ["275596", "345", "618", "1368",
                                      "874.91", "315", "0"]


def test_cross_sample_catalog_robustness():
    """Every catalog target runs against every bundled table without
    crashing, always yielding (at least) a Reference row — the
    cross-sample regime min_cov's zero-coverage case exercises, here
    driven through the full find_mutation path."""
    import os
    from km_tpu.models.finder import VariantFinder
    from km_tpu.models.sequence import TargetSeq
    from km_tpu.models.table import CountTable
    from km_tpu.io.fasta import read_target

    cat = f"{REFDATA}/catalog/GRCh38"
    jfs = sorted(os.listdir(f"{REFDATA}/jf"))
    for jf in jfs:
        table = CountTable.from_jf(f"{REFDATA}/jf/{jf}")
        for fa in sorted(os.listdir(cat)):
            seqs, _ = read_target(os.path.join(cat, fa))
            target = TargetSeq("".join(seqs), fa[:-3], table.k)
            finder = VariantFinder(target, table)
            finder.find_alt_paths()
            finder.quantify_paths()
            finder.quantify_clusters()
            rows = finder.sorted_rows()
            assert any(r.type == "Reference" for r in rows), (jf, fa)


def test_graphical_coverage_plot(tmp_path, monkeypatch):
    """-g produces the per-path k-mer coverage figure (reference:
    km/utils/MutationFinder.py:591-611); smoke on the Agg backend."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    shown = []
    monkeypatch.setattr(plt, "show", lambda: shown.append(plt.gcf()))

    from km_tpu.io.fasta import read_target
    from km_tpu.models.finder import VariantFinder
    from km_tpu.models.sequence import TargetSeq
    from km_tpu.models.table import CountTable

    from helpers import REFDATA

    tab = CountTable.from_jf(f"{REFDATA}/jf/02H025_NPM1.jf")
    seqs, _ = read_target(
        f"{REFDATA}/catalog/GRCh38/NPM1_4ins_exons_10-11utr.fa")
    f = VariantFinder(TargetSeq("".join(seqs), "NPM1", tab.k), tab)
    f.find_alt_paths()
    f.quantify_paths(graphical=True)
    assert shown, "-g did not produce a figure"
    assert shown[0].axes and shown[0].axes[0].lines
