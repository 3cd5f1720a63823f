"""Golden acceptance tests: the five variant-biology cases of the
reference test suite (values ported from km/tests/test_main.py — the
authoritative spec; the reference README is stale in two places).

Each case runs find_mutation end-to-end against a bundled .jf fixture,
pipes the captured text into find_report (TSV and VCF modes), and asserts
the exact golden fields.
"""

from io import StringIO

import pytest

from km_tpu.tools.find_mutation import main_find_mut
from km_tpu.tools.find_report import main_find_report

from helpers import REFDATA, find_mutation_args, find_report_args, run_tool

CATALOG = f"{REFDATA}/catalog/GRCh38"
JF = f"{REFDATA}/jf"


def run_case(target, jf):
    fm_out, _ = run_tool(main_find_mut, find_mutation_args(target, jf))
    return fm_out


def report_fields(target, fm_out, line=2, **overrides):
    out, _ = run_tool(main_find_report,
                      find_report_args(target, StringIO(fm_out), **overrides))
    return out.split("\n")[line].split("\t")


def vcf_rows(target, fm_out):
    out, err = run_tool(
        main_find_report,
        find_report_args(target, StringIO(fm_out), format="vcf"))
    rows = [l.split("\t") for l in out.split("\n") if l and l[0] != "#"]
    return rows, err


def test_npm1_insertion_itd():
    target = f"{CATALOG}/NPM1_4ins_exons_10-11utr.fa"
    fm_out = run_case(target, f"{JF}/02H025_NPM1.jf")
    row = fm_out.split("\n")[13].split("\t")
    assert row[2] == "Insertion"
    assert row[3] == "45:/TCTG:45"
    assert row[8] == ("CGGATGACTGACCAAGAGGCTATTCAAGATCTCTGTCTGGCAGTGGAGG"
                      "AAGTCTCTTTAAGAAAATAG")

    rep = report_fields(target, fm_out)
    assert rep[2] == "chr5:171410544"
    assert rep[3] == "ITD"
    assert rep[4] == "0"
    assert rep[5] == "4 | 1"
    assert rep[6] == "2870.6"
    assert rep[7] == "3055.2"
    assert rep[8] == "0.484"
    assert rep[9] == "2428"
    assert rep[11] == "/TCTG"
    assert rep[14] == ("AATTGCTTCCGGATGACTGACCAAGAGGCTATTCAAGATCTCTGTCTGGC"
                       "AGTGGAGGAAGTCTCTTTAAGAAAATAGTTTAAA")

    rows, _ = vcf_rows(target, fm_out)
    assert rows[0][1] == "171410539"
    assert rows[0][3] == "CTCTGG"
    assert rows[0][4] == "CTCTGTCTGG"


def test_flt3_i_and_i():
    target = f"{CATALOG}/FLT3-ITD_exons_13-15.fa"
    fm_out = run_case(target, f"{JF}/03H112_IandI.jf")
    row = fm_out.split("\n")[13].split("\t")
    assert row[2] == "ITD"
    assert row[3] == ("152:/TCTTGCGTTCATCACTTTTCCAAAAGCACCTGATCCTAGTACCTTC"
                      "CCAAACTCTAAATTTTCTCTTGGAAACTCCCATTTGAGATCATATTC:152")
    assert row[8] == (
        "TTGAGACTCCTGTTTTGCTAATTCCATAAGCTGTTGCGTTCATCACTTTTCCAAAAGCACC"
        "TGATCCTAGTACCTTCCCAAACTCTAAATTTTCTCTTGGAAACTCCCATTTGAGATCATAT"
        "TCTCTTGCGTTCATCACTTTTCCAAAAGCACCTGATCCTAGTACCTTCCCAAACTCTAAAT"
        "TTTCTCTTGGAAACTCCCATTTGAGATCATATTCATATTCTCTGAAATCAACGTAGAAGTA"
        "CTC")

    rep = report_fields(target, fm_out)
    assert rep[2] == "chr13:28034128"
    assert rep[3] == "I&I"
    assert rep[4] == "0"
    assert rep[5] == "93 | 1"
    assert rep[6] == "399.1"
    assert rep[7] == "398.5"
    assert rep[8] == "0.500"
    assert rep[9] == "285"
    assert rep[11] == ("/TCTTGCGTTCATCACTTTTCCAAAAGCACCTGATCCTAGTACCTTCCCA"
                       "AACTCTAAATTTTCTCTTGGAAACTCCCATTTGAGATCATATTC")
    assert rep[14] == (
        "CTTTCAGCATTTTGACGGCAACCTGGATTGAGACTCCTGTTTTGCTAATTCCATAAGCTGT"
        "TGCGTTCATCACTTTTCCAAAAGCACCTGATCCTAGTACCTTCCCAAACTCTAAATTTTCT"
        "CTTGGAAACTCCCATTTGAGATCATATTCTCTTGCGTTCATCACTTTTCCAAAAGCACCTG"
        "ATCCTAGTACCTTCCCAAACTCTAAATTTTCTCTTGGAAACTCCCATTTGAGATCATATTC"
        "ATATTCTCTGAAATCAACGTAGAAGTACTCATTATCTGAGGAGCCGGTCACCTGTACCATC"
        "TGTAGCTGGCTTTCATACCTAAATTGCTTTTTGTACTTGTGACAAATTAGCAGGGTTAAAA"
        "CGACAATGAAGAGGAGACAAACACCAATTGTTGCATAGAATGAGATGTTGTCTTGGATGAA"
        "AGGGAAGGGGC")

    # a 93bp I&I spans two exons: VCF row must be suppressed with a NOTE
    _, err = vcf_rows(target, fm_out)
    notes = [l for l in err.split("\n") if l.startswith("NOTE:")]
    assert notes[0] == ("NOTE: Mutation overlaps 2 exons or more, "
                        "VCF output is disabled ")


def test_flt3_itd():
    target = f"{CATALOG}/FLT3-ITD_exons_13-15.fa"
    fm_out = run_case(target, f"{JF}/03H116_ITD.jf")
    row = fm_out.split("\n")[13].split("\t")
    assert row[2] == "ITD"
    assert row[3] == ("204:/AACTCCCATTTGAGATCATATTCATATTCTCTGAAATCAACGTAGAA"
                      "GTACTCATTATCTGAGGAGCCGGTCACC:204")
    assert row[8] == (
        "TACCTTCCCAAACTCTAAATTTTCTCTTGGAAACTCCCATTTGAGATCATATTCATATTCT"
        "CTGAAATCAACGTAGAAGTACTCATTATCTGAGGAGCCGGTCACCAACTCCCATTTGAGAT"
        "CATATTCATATTCTCTGAAATCAACGTAGAAGTACTCATTATCTGAGGAGCCGGTCACCTG"
        "TACCATCTGTAGCTGGCTTTCATACCTA")

    rep = report_fields(target, fm_out)
    assert rep[2] == "chr13:28034180"
    assert rep[3] == "ITD"
    assert rep[4] == "0"
    assert rep[5] == "75 | 1"
    assert rep[6] == "417.6"
    assert rep[7] == "1096.7"
    assert rep[8] == "0.276"
    assert rep[9] == "443"
    assert rep[11] == ("/AACTCCCATTTGAGATCATATTCATATTCTCTGAAATCAACGTAGAAGT"
                       "ACTCATTATCTGAGGAGCCGGTCACC")
    assert rep[14] == (
        "CTTTCAGCATTTTGACGGCAACCTGGATTGAGACTCCTGTTTTGCTAATTCCATAAGCTGT"
        "TGCGTTCATCACTTTTCCAAAAGCACCTGATCCTAGTACCTTCCCAAACTCTAAATTTTCT"
        "CTTGGAAACTCCCATTTGAGATCATATTCATATTCTCTGAAATCAACGTAGAAGTACTCAT"
        "TATCTGAGGAGCCGGTCACCAACTCCCATTTGAGATCATATTCATATTCTCTGAAATCAAC"
        "GTAGAAGTACTCATTATCTGAGGAGCCGGTCACCTGTACCATCTGTAGCTGGCTTTCATAC"
        "CTAAATTGCTTTTTGTACTTGTGACAAATTAGCAGGGTTAAAACGACAATGAAGAGGAGAC"
        "AAACACCAATTGTTGCATAGAATGAGATGTTGTCTTGGATGAAAGGGAAGGGGC")

    rows, _ = vcf_rows(target, fm_out)
    assert rows[0][1] == "28034104"
    assert rows[0][3] == ("AAACTCCCATTTGAGATCATATTCATATTCTCTGAAATCAACGTAGAAG"
                          "TACTCATTATCTGAGGAGCCGGTCACCT")
    assert rows[0][4] == (
        "AAACTCCCATTTGAGATCATATTCATATTCTCTGAAATCAACGTAGAAGTACTCATTATCT"
        "GAGGAGCCGGTCACCAACTCCCATTTGAGATCATATTCATATTCTCTGAAATCAACGTAGA"
        "AGTACTCATTATCTGAGGAGCCGGTCACCT")


def test_flt3_tkd_deletion():
    target = f"{CATALOG}/FLT3-TKD_exon_20.fa"
    fm_out = run_case(target, f"{JF}/05H094_FLT3-TKD_del.jf")
    row = fm_out.split("\n")[13].split("\t")
    assert row[2] == "Deletion"
    assert row[3] == "32:gat/:35"
    assert row[8] == ("TGCCCCTGACAACATAGTTGGAATCACTCATATCTCGAGCCAATCCAAA"
                      "GTCACATATCTT")

    rep = report_fields(target, fm_out)
    assert rep[2] == ""
    assert rep[3] == "Deletion"
    assert rep[11] == "gat/"
    assert rep[14] == ("TGCCCCTGACAACATAGTTGGAATCACTCATATCTCGAGCCAATCCAAA"
                       "GTCACATATCTTCACC")

    rows, _ = vcf_rows(target, fm_out)
    assert rows[0][1] == "28018497"
    assert rows[0][3] == "CATGATA"
    assert rows[0][4] == "CATA"


def test_dnmt3a_substitution():
    target = f"{CATALOG}/DNMT3A_R882_exon_23.fa"
    fm_out = run_case(target, f"{JF}/02H033_DNMT3A_sub.jf")
    row = fm_out.split("\n")[13].split("\t")
    assert row[2] == "Substitution"
    assert row[3] == "33:c/T:34"
    assert row[8] == ("TGACCGGCCCAGCAGTCTCTGCCTCGCCAAGTGGCTCATGTTGGAGACG"
                      "TCAGTATAGTGGA")

    rep = report_fields(target, fm_out)
    assert rep[2] == "chr2:25234373"
    assert rep[3] == "Substitution"
    assert rep[4] == "1"
    assert rep[5] == "1"
    assert rep[6] == "33.7"
    assert rep[7] == "48.7"
    assert rep[8] == "0.409"
    assert rep[9] == "32"
    assert rep[11] == "c/T"
    assert rep[14] == ("ATGACCGGCCCAGCAGTCTCTGCCTCGCCAAGTGGCTCATGTTGGAGAC"
                       "GTCAGTATAGTGGACT")

    rows, _ = vcf_rows(target, fm_out)
    assert rows[0][1] == "25234373"
    assert rows[0][3] == "C"
    assert rows[0][4] == "T"
