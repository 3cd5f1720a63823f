"""Batched catalog mode for find_mutation (`--batch`).

The full pipeline — frontier walk, path enumeration, quantification,
classification — runs through models.batch.run_catalog: on an
accelerator backend the count table is promoted to a DeviceCountTable
and every stage executes as batched device dispatches (single-dispatch
while_loop walk, lockstep Dijkstra sweeps, one batched NNLS solve);
on a CPU-only backend the host-orchestrated batch path runs instead.
Either way the rows are byte-identical to sequential mode (asserted in
tests/test_batch_pipeline.py). Replaces the reference's
one-process-per-target shell loop (reference:
example/run_leucegene.sh:29-35).
"""

from __future__ import annotations

import os
import sys

from ..models.batch import run_catalog
from ..utils import profiling


def _device_backend() -> bool:
    """True when a non-CPU JAX backend will run the batched kernels.
    KM_TPU_BATCH_DEVICE=0/1 overrides the autodetection."""
    forced = os.environ.get("KM_TPU_BATCH_DEVICE")
    if forced is not None:
        return forced not in ("", "0", "false")
    import jax

    return jax.default_backend() != "cpu"


def emit_batched(targets, table, args) -> None:
    if _device_backend():
        from ..ops.device_table import DeviceCountTable
        from ..utils import jaxcache

        jaxcache.enable()
        with profiling.phase("table_to_device"):
            table = DeviceCountTable.from_host(table)

    with profiling.phase("batch_pipeline"):
        row_lists = run_catalog(
            targets, table, ratio=args.ratio, count=args.count,
            max_stack=args.steps, max_break=args.branchs,
            max_node=args.nodes, graphical=args.graphical)
    for rows in row_lists:
        for row in rows:
            sys.stdout.write(str(row) + "\n")
