"""Byte-level regression: full find_mutation / find_report / VCF outputs
must match the frozen artifacts in tests/golden/ (volatile '#' comment
lines excluded from the find_mutation comparison)."""

import os
from io import StringIO

import pytest

from km_tpu.tools.find_mutation import main_find_mut
from km_tpu.tools.find_report import main_find_report

from helpers import REFDATA, find_mutation_args, find_report_args, run_tool

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
JF = f"{REFDATA}/jf"

# GRCh38 goldens are anchored to the reference's own test expectations;
# the GRCh37 set (tests/golden/GRCh37/, same variants, build-37
# coordinates) is additionally validated independently of the engine:
# test_grch37_consistent_with_grch38 rebuilds both builds' per-base
# coordinate lists straight from the FASTA headers and checks that the
# frozen GRCh37 rows are the target-index-equivalent translation of the
# anchored GRCh38 rows.
_TARGETS = {
    "NPM1": ("NPM1_4ins_exons_10-11utr.fa", "02H025_NPM1.jf"),
    "FLT3_ITD": ("FLT3-ITD_exons_13-15.fa", "03H116_ITD.jf"),
    "FLT3_IandI": ("FLT3-ITD_exons_13-15.fa", "03H112_IandI.jf"),
    "FLT3_TKD": ("FLT3-TKD_exon_20.fa", "05H094_FLT3-TKD_del.jf"),
    "DNMT3A": ("DNMT3A_R882_exon_23.fa", "02H033_DNMT3A_sub.jf"),
}
CASES = {}
for _name, (_fa, _jf) in _TARGETS.items():
    CASES[_name] = (f"{REFDATA}/catalog/GRCh38/{_fa}", f"{JF}/{_jf}")
    CASES[f"GRCh37/{_name}"] = (f"{REFDATA}/catalog/GRCh37/{_fa}",
                                f"{JF}/{_jf}")


def _read(name):
    """Golden bytes, with the Database column's data-tree prefix mapped
    to the active fixture tree. The goldens were frozen against the
    reference's original in-tree data; km echoes the `.jf` argv path
    verbatim into the Database column, so this one substitution is the
    only path-dependent byte in them (the fixtures themselves are
    vendored verbatim under data/)."""
    with open(os.path.join(GOLDEN, name)) as f:
        return f.read().replace("/root/reference/data", REFDATA)


@pytest.mark.parametrize("case", sorted(CASES))
def test_full_outputs_byte_identical(case):
    target, jf = CASES[case]
    fm, _ = run_tool(main_find_mut, find_mutation_args(target, jf))
    stable = "\n".join(l for l in fm.split("\n") if not l.startswith("#"))
    assert stable == _read(f"{case}.find_mutation.tsv")

    rep, _ = run_tool(main_find_report,
                      find_report_args(target, StringIO(fm)))
    assert rep == _read(f"{case}.find_report.tsv")

    vcf, _ = run_tool(main_find_report,
                      find_report_args(target, StringIO(fm), format="vcf"))
    assert vcf == _read(f"{case}.vcf")


# --- independent GRCh37 validation (no engine code involved) ----------


def _per_base_coords(fa_path):
    """chromosome + per-base genomic coordinate list of the
    concatenated target, parsed directly from the FASTA headers (all
    bundled catalog targets are '+' strand)."""
    coords = []
    chro = None
    with open(fa_path) as f:
        for line in f:
            if line.startswith(">"):
                loc = line[1:].split("|")[0].split()[0].strip()
                chro, rng = loc.split(":")
                lo, hi = rng.split("-")
                coords.extend(range(int(lo), int(hi) + 1))
    return chro, coords


def _translate_token(tok, c38, ix38, c37, nts37):
    """Translate one coordinate token ('chr:a-b' or 'chr:a') from
    GRCh38 to GRCh37 through the shared target index. A coordinate is
    either a real target base or a base+1 region endpoint."""
    if ":" not in tok:
        return tok
    chro, rng = tok.split(":")
    assert chro == c38

    def one(x):
        x = int(x)
        if x in ix38:
            return nts37[ix38[x]]
        return nts37[ix38[x - 1]] + 1

    if "-" in rng:
        a, b = rng.split("-")
        return "{}:{}-{}".format(c37, one(a), one(b))
    return "{}:{}".format(c37, one(rng))


@pytest.mark.parametrize("case", sorted(_TARGETS))
def test_grch37_consistent_with_grch38(case):
    """The frozen GRCh37 report must equal the anchored GRCh38 report
    with every genomic coordinate re-derived through the target index
    (same target sequence, different header coordinates)."""
    fa, _jf = _TARGETS[case]
    c38, nts38 = _per_base_coords(f"{REFDATA}/catalog/GRCh38/{fa}")
    c37, nts37 = _per_base_coords(f"{REFDATA}/catalog/GRCh37/{fa}")
    assert len(nts38) == len(nts37)
    ix38 = {v: i for i, v in enumerate(nts38)}

    rows38 = _read(f"{case}.find_report.tsv").splitlines()
    rows37 = _read(f"GRCh37/{case}.find_report.tsv").splitlines()
    assert len(rows38) == len(rows37)
    for r38, r37 in zip(rows38[1:], rows37[1:]):
        f38, f37 = r38.split("\t"), r37.split("\t")
        for col, (v38, v37) in enumerate(zip(f38, f37)):
            if col in (1, 2):  # Region, Location
                assert v37 == _translate_token(v38, c38, ix38, c37,
                                               nts37), (case, col)
            else:
                assert v37 == v38, (case, col)


def test_find_mutation_full_output_shape():
    """Whole-output contract vs km: '#func:...' first, then the ten
    argument echoes in km's order, the 12-column header, the golden
    rows, and the '#Elapsed time:' footer — nothing else (reference:
    km/tools/find_mutation.py:26-27,60 and km/km.py:31-32)."""
    target, jf = CASES["NPM1"]
    args = find_mutation_args(target, jf)
    args.func = main_find_mut  # the CLI injects this like km does
    args.profile = None  # km_tpu extras must NOT echo without -vv
    args.batch = False
    out, _ = run_tool(main_find_mut, args)
    lines = out.splitlines()
    assert lines[0].startswith("#func:")
    expected_echo = [
        "#count:5", "#ratio:0.05", "#steps:500", "#branchs:10",
        "#nodes:10000", "#graphical:False", "#verbose:False",
        "#debug:False", "#target_fn:['%s']" % target,
        "#jellyfish_fn:%s" % jf,
    ]
    assert lines[1:11] == expected_echo
    golden = _read("NPM1.find_mutation.tsv").splitlines()
    assert lines[11:11 + len(golden)] == golden
    assert lines[11 + len(golden)].startswith("#Elapsed time:")
    assert len(lines) == 12 + len(golden)
