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
CAT = f"{REFDATA}/catalog/GRCh38"
JF = f"{REFDATA}/jf"

CASES = {
    "NPM1": (f"{CAT}/NPM1_4ins_exons_10-11utr.fa", f"{JF}/02H025_NPM1.jf"),
    "FLT3_ITD": (f"{CAT}/FLT3-ITD_exons_13-15.fa", f"{JF}/03H116_ITD.jf"),
    "FLT3_IandI": (f"{CAT}/FLT3-ITD_exons_13-15.fa", f"{JF}/03H112_IandI.jf"),
    "FLT3_TKD": (f"{CAT}/FLT3-TKD_exon_20.fa", f"{JF}/05H094_FLT3-TKD_del.jf"),
    "DNMT3A": (f"{CAT}/DNMT3A_R882_exon_23.fa", f"{JF}/02H033_DNMT3A_sub.jf"),
}


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
