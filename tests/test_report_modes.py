"""find_report's secondary modes: per-sample pivot table (-f table),
exclusion count table (-e), cluster info filter (-i cluster), and the
min-coverage row filter (-m) — semantics per reference
km/tools/find_report.py:118-142,290-327."""

from io import StringIO

import pytest

from km_tpu.tools.find_mutation import main_find_mut
from km_tpu.tools.find_report import main_find_report

from helpers import REFDATA, find_mutation_args, find_report_args, run_tool

TARGET = f"{REFDATA}/catalog/GRCh38/NPM1_4ins_exons_10-11utr.fa"
JF = f"{REFDATA}/jf/02H025_NPM1.jf"


@pytest.fixture(scope="module")
def npm1_fm():
    out, _ = run_tool(main_find_mut, find_mutation_args(TARGET, JF))
    return out


def test_table_mode_pivot(npm1_fm):
    out, _ = run_tool(main_find_report,
                      find_report_args(TARGET, StringIO(npm1_fm),
                                       format="table"))
    lines = out.rstrip("\n").split("\n")
    assert lines[0].split("\t") == [
        "Sample", "Reference/NPM1_4ins_exons_10-11utr",
        "chr5:171410544-171410545:/TCTG"]
    row = lines[1].split("\t")
    assert row[0] == JF
    assert row[1] == "nan"  # Reference rows keep their (nan) ratio
    assert row[2] == "0.484"


def test_exclusion_db_column(npm1_fm):
    # the sample itself as exclusion DB: every alt k-mer present, so
    # Exclu_min_cov equals the path's own min coverage
    out, _ = run_tool(main_find_report,
                      find_report_args(TARGET, StringIO(npm1_fm), exclu=JF))
    rows = [l.split("\t") for l in out.rstrip("\n").split("\n")[1:]]
    by_type = {r[3]: r for r in rows}
    assert by_type["ITD"][10] == "2428"
    assert by_type["Reference"][10] == "2379"


def test_exclusion_db_zero_when_absent(npm1_fm):
    # a different sample's table: the NPM1 alt k-mers are absent -> 0
    other = f"{REFDATA}/jf/02H033_DNMT3A_sub.jf"
    out, _ = run_tool(main_find_report,
                      find_report_args(TARGET, StringIO(npm1_fm),
                                       exclu=other))
    rows = [l.split("\t") for l in out.rstrip("\n").split("\n")[1:]]
    by_type = {r[3]: r for r in rows}
    assert by_type["ITD"][10] == "0"


def test_cluster_info_filter(npm1_fm):
    out, _ = run_tool(main_find_report,
                      find_report_args(TARGET, StringIO(npm1_fm),
                                       info="cluster"))
    lines = out.rstrip("\n").split("\n")
    assert len(lines) == 2  # header + the one clustered ITD row
    row = lines[1].split("\t")
    assert row[3] == "ITD"
    assert row[13] == "cluster 1 n=1"
    assert row[8] == "0.484"


def test_vcf_cluster_incompatible(npm1_fm):
    with pytest.raises(SystemExit):
        run_tool(main_find_report,
                 find_report_args(TARGET, StringIO(npm1_fm),
                                  info="cluster", format="vcf"))


def test_min_cov_filter_drops_rows(npm1_fm):
    out, _ = run_tool(main_find_report,
                      find_report_args(TARGET, StringIO(npm1_fm),
                                       min_cov=10**9))
    lines = out.rstrip("\n").split("\n")
    assert len(lines) == 1  # header only


def test_minus_strand_vcf_mirrors_plus(tmp_path):
    """Strand symmetry: analysing the reverse-complemented target marked
    strand=- against the same canonical table must describe the same
    genomic event — identical VCF data row — as the '+' original
    (coordinate mapping per reference km/tools/find_report.py:58-76,
    VCF revcomp per :283-288)."""
    dn_target = f"{REFDATA}/catalog/GRCh38/DNMT3A_R882_exon_23.fa"
    dn_jf = f"{REFDATA}/jf/02H033_DNMT3A_sub.jf"

    with open(dn_target) as f:
        header = f.readline().strip()
        seq = "".join(line.strip() for line in f)
    comp = str.maketrans("ACGT", "TGCA")
    rc = seq.translate(comp)[::-1]
    minus = tmp_path / "DNMT3A_minus.fa"
    minus.write_text(f"{header} | strand=-\n{rc}\n")

    vcfs = []
    for target in (dn_target, str(minus)):
        fm, _ = run_tool(main_find_mut, find_mutation_args(target, dn_jf))
        vcf, _ = run_tool(main_find_report,
                          find_report_args(target, StringIO(fm),
                                           format="vcf"))
        rows = [l.replace("TARGET=DNMT3A_minus", "TARGET=DNMT3A_R882_exon_23")
                for l in vcf.split("\n") if l and not l.startswith("#")]
        vcfs.append(rows)
    assert vcfs[0] == vcfs[1]
    assert len(vcfs[0]) == 1 and "\t25234373\t.\tC\tT\t" in vcfs[0][0]
