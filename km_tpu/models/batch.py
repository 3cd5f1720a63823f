"""Batched catalog analysis: walk hundreds of targets concurrently.

km processes one target at a time, with one Python->C++ call per k-mer
lookup (reference: km/utils/MutationFinder.py:111-120 and the shell loop
of example/run_leucegene.sh:29-35). Here the discovery walk runs as a
*frontier expansion*: every active walklet across every target advances
one step per round, and all child lookups of a round resolve in a single
batched device dispatch against the count table.

Walk semantics per walklet match the DFS budgets (depth <= max_stack,
branch events <= max_break, commit-on-reconnect-or-loop); the only
declared difference from the sequential spec is commit *timing*:
membership checks of round t see the node set as of the end of round
t-1, so the committed fixpoint can differ from DFS ordering in
adversarial cases. Equality of final reports with the exact engine is
asserted on all bundled fixtures (tests/test_batch_pipeline.py).

Downstream stages (graph, Dijkstra, NNLS, classification) reuse the
host-spec modules per target; on catalog-size graphs they are a small
fraction of runtime.
"""

from __future__ import annotations

import sys

import numpy as np

from ..ops.device_table import DeviceCountTable, join_keys, split_keys
from .finder import VariantFinder
from .sequence import TargetSeq
from .walk import NodeBudgetExceeded


class _BatchLookup:
    """Uniform child-expansion front-end over host or device tables."""

    def __init__(self, table, ratio, count):
        self.ratio = ratio
        self.count = count
        self.is_device = isinstance(table, DeviceCountTable)
        self.table = table

    def children(self, tips: np.ndarray):
        """tips (n,) uint64 -> (child_keys (n,4) uint64, mask (n,4))."""
        if self.is_device:
            import jax.numpy as jnp

            # pad to the next power of two so XLA compiles once per size
            # class instead of once per frontier width
            n = len(tips)
            padded = max(64, 1 << (n - 1).bit_length())
            tips_p = np.zeros(padded, dtype=np.uint64)
            tips_p[:n] = tips
            hi, lo = split_keys(tips_p)
            chi, clo, _cnt, mask = self.table.children(
                jnp.asarray(hi), jnp.asarray(lo), self.ratio, self.count)
            return join_keys(np.asarray(chi)[:n], np.asarray(clo)[:n]), \
                np.asarray(mask)[:n]
        ck, cc = self.table.children_packed(tips)
        sums = cc.sum(axis=-1, keepdims=True)
        thr = np.maximum(sums.astype(np.float64) * self.ratio, self.count)
        return ck, cc >= thr

    def query(self, keys: np.ndarray) -> np.ndarray:
        return np.asarray(self.table.query_packed(keys)).astype(np.int64)


def batch_discover(targets: list[TargetSeq], table, ratio=0.05, count=5,
                   max_stack=500, max_break=10, max_node=10000,
                   on_budget: str = "raise"):
    """Frontier walk over many targets; returns per-target ordered
    {kmer: count} dicts (target k-mers first, then commits).

    on_budget: what to do when ONE target outgrows max_node — 'raise'
    mirrors the sequential CLI (km hard-exits the process,
    km/utils/MutationFinder.py:143-148); 'skip' isolates the failure
    like the reference's per-target shell loop does (only that target's
    process dies): the target's result becomes None and every other
    target completes."""
    lut = _BatchLookup(table, ratio, count)
    failed: set[int] = set()

    node_sets: list[set[int]] = []
    node_order: list[list[int]] = []
    for t in targets:
        mers = [int(m) for m in t.ref_mer]
        node_sets.append(set(mers))
        node_order.append(list(mers))

    # walklet state (parallel lists; stacks as python lists of ints)
    tgt: list[int] = []
    stacks: list[list[int]] = []
    breaks: list[int] = []
    for ti, t in enumerate(targets):
        for m in t.ref_mer:
            tgt.append(ti)
            stacks.append([int(m)])
            breaks.append(0)

    while tgt:
        tips = np.array([s[-1] for s in stacks], dtype=np.uint64)
        child_keys, mask = lut.children(tips)

        new_tgt: list[int] = []
        new_stacks: list[list[int]] = []
        new_breaks: list[int] = []
        commits: list[tuple[int, list[int]]] = []  # (target, stack)

        for w in range(len(tgt)):
            ti = tgt[w]
            if ti in failed:
                continue
            kids = [int(child_keys[w, j]) for j in range(4) if mask[w, j]]
            b = breaks[w]
            if len(kids) > 1:
                b += 1
                if b > max_break:
                    continue
            stack = stacks[w]
            known = node_sets[ti]
            on_stack = set(stack)
            for child in kids:
                if child in known or child in on_stack:
                    commits.append((ti, stack))
                else:
                    if len(stack) + 1 > max_stack:
                        continue
                    new_tgt.append(ti)
                    new_stacks.append(stack + [child])
                    new_breaks.append(b)

        # apply commits at round end (round-synchronous node-set growth)
        for ti, stack in commits:
            if ti in failed:
                continue
            ns, order = node_sets[ti], node_order[ti]
            for p in stack:
                if p not in ns:
                    ns.add(p)
                    order.append(p)
            if len(order) > max_node:
                if on_budget == "raise":
                    raise NodeBudgetExceeded(max_node)
                failed.add(ti)

        tgt, stacks, breaks = new_tgt, new_stacks, new_breaks

    # resolve counts for every node, one batched query per target
    results = []
    for ti, order in enumerate(node_order):
        if ti in failed:
            results.append(None)
            continue
        keys = np.array(order, dtype=np.uint64)
        counts = lut.query(keys)
        results.append({int(k): int(c) for k, c in zip(keys, counts)})
    return results


class PrecomputedWalker:
    """Adapter letting VariantFinder consume a precomputed node set."""

    def __init__(self, node_data: dict[int, int]):
        self._node_data = node_data

    def discover(self, _ref_mers):
        return self._node_data


def run_catalog(targets: list[TargetSeq], table, ratio=0.05, count=5,
                max_stack=500, max_break=10, max_node=10000,
                walk: str = "auto", quant: str = "auto",
                pathing: str = "auto", graphical: bool = False,
                on_budget: str = "raise"):
    """Full batched pipeline: frontier walk, then graph / path
    enumeration / quantification / classification across all targets.
    Returns one sorted row list per target.

    walk: 'host' = host-orchestrated rounds (one device dispatch per
    round), 'device' = single-dispatch while_loop walk
    (ops.batch_walk), 'auto' = device when the table lives on device.
    quant: 'host' = per-problem spec NNLS, 'device' = one batched
    dispatch for every problem of every target (ops.nnls), 'auto' =
    follow the walk choice.
    pathing: 'host' = per-target scan-min Dijkstra, 'device' = batched
    lockstep Dijkstra across targets (ops.pathgraph), 'auto' = follow
    the walk choice.
    on_budget: 'raise' = a max_node overrun aborts the whole call like
    the sequential CLI; 'skip' = the overrunning target alone yields an
    empty row list (with km's error line on stderr), matching the
    blast radius of the reference's one-process-per-target loop.
    """
    if walk == "auto":
        walk = "device" if isinstance(table, DeviceCountTable) else "host"
    if quant == "auto":
        quant = walk
    if pathing == "auto":
        pathing = walk
    fetch_counts = None
    if walk == "device":
        from ..ops.batch_walk import device_discover

        dev = (table if isinstance(table, DeviceCountTable)
               else DeviceCountTable.from_host(table))
        # counts resolve asynchronously: the query is dispatched inside
        # device_discover and read back only after the (host-side)
        # graph building below — the round trip rides under host work
        orders, fetch_counts = device_discover(
            [t.ref_mer for t in targets], dev, ratio=ratio, count=count,
            max_stack=max_stack, max_break=max_break, max_node=max_node,
            on_budget=on_budget, defer_counts=True)
        node_datas = [None if o is None else dict.fromkeys(o, 0)
                      for o in orders]
    else:
        node_datas = batch_discover(targets, table, ratio=ratio,
                                    count=count, max_stack=max_stack,
                                    max_break=max_break,
                                    max_node=max_node,
                                    on_budget=on_budget)

    finders = []
    for target, node_data in zip(targets, node_datas):
        if node_data is None:  # only possible with on_budget='skip'
            sys.stderr.write(
                "ERROR: Node query count limit exceeded: max={} "
                "(target {}; skipped, batch continues)\n".format(
                    max_node, target.name))
            finders.append(None)
            continue
        finder = finder_from_nodes(target, table, node_data)
        finders.append(finder)
    live = [f for f in finders if f is not None]
    if pathing == "device":
        from ..ops.pathgraph import batched_alt_paths

        batched_alt_paths(live)
    else:
        for finder in live:
            finder.find_alt_paths()

    if fetch_counts is not None:
        # the deferred count readback lands now, after graph building
        # and path enumeration (neither needs counts)
        for finder, node_data in zip(finders, fetch_counts()):
            if finder is not None:
                finder.counts = list(node_data.values()) + [-1, -1]

    if quant == "device" and not graphical:
        from ..ops import nnls

        jobs, emits, prewarms = [], [], []
        for finder in live:
            for paths, emit, prewarm in finder.quant_jobs():
                jobs.append((paths, finder.counts))
                emits.append(emit)
                prewarms.append(prewarm)
        # dispatch the batched solve, then do the coefficient-free host
        # work (classification + sequence strings) while it's in flight
        fetch = nnls.solve_batch(jobs, defer=True)
        for prewarm in prewarms:
            prewarm()
        for emit, (coef, rvaf) in zip(emits, fetch()):
            emit(coef, rvaf)
    else:
        for finder in live:
            finder.quantify_paths(graphical)
            finder.quantify_clusters(graphical)
    return [finder.sorted_rows() if finder is not None else []
            for finder in finders]


def finder_from_nodes(target: TargetSeq, table, node_data: dict[int, int]):
    """Build a VariantFinder from an externally discovered node set."""
    finder = VariantFinder.__new__(VariantFinder)
    finder.target = target
    finder.table = table
    finder.k = table.k
    finder.keys = list(node_data.keys())
    finder.counts = list(node_data.values()) + [-1, -1]
    finder.num_k = len(finder.keys) + 2
    finder._node_index = {key: i for i, key in enumerate(finder.keys)}
    target.set_index(finder._node_index)
    finder.start_ix = finder._node_index[target.first_kmer]
    finder.end_ix = finder._node_index[target.last_kmer]
    finder.rows = []
    finder.alt_paths = None
    return finder
