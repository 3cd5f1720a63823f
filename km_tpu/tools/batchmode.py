"""Batched catalog mode for find_mutation (`--batch`).

All targets advance through one frontier-expansion walk (every child
lookup of a round is a single batched table dispatch), then the
per-target graph/quantification/classification stages run as usual and
rows print in target order — the same rows the sequential path emits
(asserted across the bundled fixtures in tests/test_batch_pipeline.py).
Replaces the reference's one-process-per-target shell loop
(reference: example/run_leucegene.sh:29-35).
"""

from __future__ import annotations

import sys

from ..models.batch import batch_discover, finder_from_nodes
from ..utils import profiling


def emit_batched(targets, table, args) -> None:
    with profiling.phase("batch_walk"):
        node_datas = batch_discover(
            targets, table, ratio=args.ratio, count=args.count,
            max_stack=args.steps, max_break=args.branchs,
            max_node=args.nodes)
    for target, node_data in zip(targets, node_datas):
        with profiling.phase("quantify"):
            finder = finder_from_nodes(target, table, node_data)
            finder.find_alt_paths()
            finder.quantify_paths(args.graphical)
            finder.quantify_clusters(args.graphical)
        for row in finder.sorted_rows():
            sys.stdout.write(str(row) + "\n")
