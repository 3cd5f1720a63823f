"""Batched shortest-path sweeps for alternative-path enumeration.

km runs an O(N^2) scan-min Dijkstra twice per target, one target at a
time (reference: km/utils/Graph.py:63-176 — hot loop #3). Catalog graphs
are small (hundreds of nodes) but there are hundreds of them, so the
device formulation batches them: dense padded adjacency [B, N, N] built
on device from sparse edge lists, then every target's Dijkstra advances
in lockstep — one argmin + one adjacency-row gather + one elementwise
relax per iteration, vectorized over the batch.

The iteration is step-for-step the reference algorithm, not an
approximation: extraction = argmin over a working distance array whose
visited entries are parked at +inf (lowest index on ties, like the
reference's array scan), relaxation = strict float32 improvement,
predecessor = the extracted node. Parked/unreachable nodes re-extract as
no-ops, so running the loop a fixed N iterations is equivalent to the
reference's exactly-n loop. The resulting predecessor trees are asserted
EQUAL (not approximately) to the host sweeps across the bundled fixtures
(tests/test_pathgraph.py); splicing and ref-edge removal stay on host
(km_tpu.models.pathfinder).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

MAX_DENSE_NODES = 2048  # graphs past this fall back to the host sweep
CHUNK_BYTES = 256 << 20  # dense [B, n, n] adjacency budget per dispatch
# XLA:TPU compile time for the sweep grows sharply with batch width
# (B=512 at n=128 compiles for >10 min; B=64 in seconds), so chunks
# stay narrow and the deferred readback below pipelines the dispatches
MAX_CHUNK = 64


@partial(jax.jit, static_argnames=("n",))
def sweep_kernel(esrc, edst, ew, starts, rstarts, *, n):
    """Both Dijkstra sweeps for a batch of graphs.

    esrc/edst [B, E] int32 (padding rows point at n*n, dropped), ew
    [B, E] float32, starts/rstarts [B] int32 (forward source / reverse
    source). Returns (before, after) predecessor arrays, [B, n] int32.
    """
    B, _E = esrc.shape
    rows = jnp.arange(B, dtype=jnp.int32)

    flat = jnp.full((B, n * n), jnp.inf, jnp.float32)
    flat = flat.at[rows[:, None], esrc * n + edst].set(ew, mode="drop")
    w = flat.reshape(B, n, n)

    def sweep(adj, start):
        dist0 = jnp.full((B, n), jnp.inf, jnp.float32)
        dist0 = dist0.at[rows, start].set(0.0)

        def body(_, state):
            dist, work, prev = state
            i = jnp.argmin(work, axis=1).astype(jnp.int32)
            work = work.at[rows, i].set(jnp.inf)
            row = adj[rows, i, :]
            ndist = row + dist[rows, i][:, None]
            better = ndist < dist
            dist = jnp.where(better, ndist, dist)
            work = jnp.where(better, ndist, work)
            prev = jnp.where(better, i[:, None], prev)
            return dist, work, prev

        prev0 = jnp.full((B, n), -1, jnp.int32)
        _, _, prev = jax.lax.fori_loop(0, n, body, (dist0, dist0, prev0))
        return prev

    # one output array -> one device-to-host transfer per dispatch
    return jnp.stack([sweep(w, starts),
                      sweep(jnp.swapaxes(w, 1, 2), rstarts)], axis=1)


def batched_sweeps(graphs):
    """Run before/after sweeps for a list of frozen OverlapGraphs in
    size-bucketed device dispatches; returns [(before, after)] numpy
    pairs aligned with the input."""
    import logging as log

    out = [None] * len(graphs)
    buckets: dict[int, list[int]] = {}
    for gi, g in enumerate(graphs):
        n_pad = max(128, 1 << int(np.ceil(np.log2(max(g.n, 2)))))
        if g.n > MAX_DENSE_NODES:
            log.info("pathgraph: %d-node graph exceeds the %d-node dense "
                     "bound, host sweep", g.n, MAX_DENSE_NODES)
            out[gi] = (
                g._sweep(g.first_node, g.succ_ptr, g.succ_ids, g.succ_w),
                g._sweep(g.last_node, g.pred_ptr, g.pred_ids, g.pred_w))
        else:
            buckets.setdefault(n_pad, []).append(gi)

    # queue every dispatch before the first readback: JAX dispatch is
    # async, so device compute and host->device staging pipeline, and
    # each result then costs one device-to-host transfer
    pending = []
    for n_pad, idxs in buckets.items():
        chunk = max(1, min(MAX_CHUNK, CHUNK_BYTES // (n_pad * n_pad * 4)))
        for lo in range(0, len(idxs), chunk):
            part = idxs[lo:lo + chunk]
            e_max = max(max(len(graphs[gi].esrc) for gi in part), 1)
            e_pad = 1 << int(np.ceil(np.log2(max(e_max, 2))))
            # batch padded to a power of two: stable compile shapes
            # (padding rows are empty graphs, swept as no-ops)
            B = max(8, 1 << int(np.ceil(np.log2(max(len(part), 2)))))
            esrc = np.full((B, e_pad), n_pad, np.int32)  # pad -> oob, drop
            edst = np.zeros((B, e_pad), np.int32)
            ew = np.zeros((B, e_pad), np.float32)
            starts = np.zeros(B, np.int32)
            rstarts = np.zeros(B, np.int32)
            for b, gi in enumerate(part):
                g = graphs[gi]
                ne = len(g.esrc)
                esrc[b, :ne] = g.esrc
                edst[b, :ne] = g.edst
                ew[b, :ne] = _edge_weights(g)
                starts[b] = g.first_node
                rstarts[b] = g.last_node
            pending.append((part, sweep_kernel(
                jnp.asarray(esrc), jnp.asarray(edst), jnp.asarray(ew),
                jnp.asarray(starts), jnp.asarray(rstarts), n=n_pad)))

    for part, trees_dev in pending:
        trees = np.asarray(trees_dev)
        for b, gi in enumerate(part):
            g = graphs[gi]
            out[gi] = (trees[b, 0, :g.n].copy(), trees[b, 1, :g.n].copy())
    return out


def _edge_weights(g) -> np.ndarray:
    """Per-edge weights aligned with (g.esrc, g.edst). freeze() keeps
    the forward CSR value array in (src, dst) order already."""
    return g.succ_w


def batched_alt_paths(finders) -> None:
    """Drive the full path-enumeration stage for many VariantFinders:
    graphs built on host, both sweeps batched on device, ref-edge
    removal + splicing on host. Sets finder.alt_paths."""
    graphs = []
    for f in finders:
        g = f.build_graph()
        g.freeze()
        graphs.append(g)
    trees = batched_sweeps(graphs)
    for f, g, (before, after) in zip(finders, graphs, trees):
        g.set_trees(before, after)
        f.paths_from_graph(g)
