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
# coordinates) is frozen from this engine as coordinate-mapping
# regression coverage for the second catalog build the reference ships.
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
    with open(os.path.join(GOLDEN, name)) as f:
        return f.read()


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
