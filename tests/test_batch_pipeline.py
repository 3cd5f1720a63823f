"""The batched frontier pipeline must produce the same rows as the exact
sequential engine on every fixture, with host and device tables."""

import numpy as np
import pytest

from km_tpu.models.batch import run_catalog
from km_tpu.models.finder import VariantFinder
from km_tpu.models.sequence import TargetSeq
from km_tpu.models.table import CountTable
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


def exact_rows(target_name, jf_name):
    table = CountTable.from_jf(f"{REFDATA}/jf/{jf_name}.jf")
    seqs, _ = __import__("km_tpu.io.fasta", fromlist=["read_target"]) \
        .read_target(f"{CAT}/{target_name}.fa")
    target = TargetSeq("".join(seqs), target_name, table.k)
    finder = VariantFinder(target, table)
    finder.find_alt_paths()
    finder.quantify_paths()
    finder.quantify_clusters()
    return [str(r) for r in finder.sorted_rows()]


@pytest.mark.parametrize("device", [False, True])
def test_batched_matches_exact(device):
    from km_tpu.io.fasta import read_target

    host_tables = {jf: CountTable.from_jf(f"{REFDATA}/jf/{jf}.jf")
                   for _, jf in CASES}

    for target_name, jf_name in CASES:
        table = host_tables[jf_name]
        if device:
            table = DeviceCountTable.from_host(table)
        seqs, _ = read_target(f"{CAT}/{target_name}.fa")
        target = TargetSeq("".join(seqs), target_name, 31)
        rows = run_catalog([target], table)[0]
        assert [str(r) for r in rows] == exact_rows(target_name, jf_name), \
            f"{target_name} vs {jf_name} ({'device' if device else 'host'})"


def test_batch_of_all_catalog_targets():
    """All 9 GRCh38 catalog targets in one batch against one sample."""
    import os

    from km_tpu.io.fasta import read_target

    table = CountTable.from_jf(f"{REFDATA}/jf/03H116_ITD.jf")
    targets = []
    for fn in sorted(os.listdir(CAT)):
        seqs, _ = read_target(os.path.join(CAT, fn))
        name = os.path.splitext(fn)[0]
        targets.append(TargetSeq("".join(seqs), name, table.k))
    all_rows = run_catalog(targets, table)
    assert len(all_rows) == 9
    flt3 = dict(zip([t.name for t in targets], all_rows))
    itd_rows = [r for r in flt3["FLT3-ITD_exons_13-15"]
                if r.fields()[2] == "ITD"]
    assert itd_rows, "expected the FLT3 ITD to be found in batch mode"
