"""Overlap graph + double-Dijkstra alternative-path enumeration.

Capability equivalent of km's Graph (reference: km/utils/Graph.py:8-240)
with the same weighting scheme and selection rules:

- every (k-1)-overlap between discovered nodes is an edge of weight 1;
- consecutive target k-mers and the capping edges (source cap -> first
  target k-mer, last target k-mer -> sink cap) are reweighted to 0.01, so
  shortest paths hug the reference except where a variant bridge exists;
- one Dijkstra from the source over the graph and one from the sink over
  the transpose give, for every node, its best predecessor/successor
  (scan-min selection, lowest index on ties, float32 accumulation — matching
  km/utils/Graph.py:63-119 numerics);
- reference edges are deleted from the candidate edge set by walking the
  successor tree (including km's quirk of never deleting the first edge
  of each walk, km/utils/Graph.py:184-198 — this is what makes the
  reference path itself reappear as a candidate and produce Reference
  rows);
- every surviving edge is spliced into predecessor-chain + edge +
  successor-chain; paths that span source->sink are kept and deduplicated.

Representation differs from km: adjacency is sparse (built by hashing
(k-1)-prefixes of packed keys), never an N x N dense matrix.
"""

from __future__ import annotations

import logging as log

import numpy as np


class OverlapGraph:
    """Sparse weighted digraph over discovered k-mer nodes + 2 cap nodes."""

    def __init__(self, keys: list[int], k: int):
        """keys: packed node k-mers in node-id order (real nodes only)."""
        self.n_real = len(keys)
        self.n = self.n_real + 2
        self.first_node = self.n_real  # source cap ("BigBang" in km)
        self.last_node = self.n_real + 1  # sink cap ("BigCrunch")
        self.k = k

        # adjacency: per-node lists, grown then frozen to arrays
        self._succ: list[dict[int, np.float32]] = [dict() for _ in range(self.n)]
        self.edge_set: set[tuple[int, int]] = set()

        keys_arr = np.asarray(keys, dtype=np.uint64)
        if self.n_real:
            prefix = keys_arr >> np.uint64(2)
            suffix = keys_arr & np.uint64((1 << (2 * (k - 1))) - 1)
            # group node ids by prefix value
            order = np.argsort(prefix, kind="stable")
            sp = prefix[order]
            starts = np.searchsorted(sp, suffix, side="left")
            ends = np.searchsorted(sp, suffix, side="right")
            for i in range(self.n_real):
                for idx in range(starts[i], ends[i]):
                    j = int(order[idx])
                    if i != j:
                        self.set_edge(i, j, 1.0)

    def set_edge(self, i: int, j: int, w: float) -> None:
        self._succ[i][j] = np.float32(w)
        self.edge_set.add((i, j))

    def freeze(self) -> None:
        """Convert adjacency to arrays for the Dijkstra sweeps."""
        self.succ_ids = [np.fromiter(d.keys(), dtype=np.int64, count=len(d))
                         for d in self._succ]
        self.succ_w = [np.fromiter(d.values(), dtype=np.float32, count=len(d))
                       for d in self._succ]
        pred: list[dict[int, np.float32]] = [dict() for _ in range(self.n)]
        for i, d in enumerate(self._succ):
            for j, w in d.items():
                pred[j][i] = w
        self.pred_ids = [np.fromiter(d.keys(), dtype=np.int64, count=len(d))
                         for d in pred]
        self.pred_w = [np.fromiter(d.values(), dtype=np.float32, count=len(d))
                       for d in pred]

    def _sweep(self, start: int, nbr_ids, nbr_w) -> np.ndarray:
        """Scan-min Dijkstra; returns the predecessor array (w.r.t. the
        direction given by the adjacency passed in)."""
        n = self.n
        prev = np.full(n, -1, dtype=np.int32)
        dist = np.full(n, np.inf, dtype=np.float32)
        unvisited = np.ones(n, dtype=bool)
        dist[start] = 0
        for _ in range(n):
            unv_ix = np.where(unvisited)[0]
            i = int(unv_ix[dist[unv_ix].argmin()])
            ids = nbr_ids[i]
            if ids.size:
                ndist = nbr_w[i] + dist[i]  # float32, matches km's w[i,:]+dist[i]
                better = ndist < dist[ids]
                upd = ids[better]
                dist[upd] = ndist[better]
                prev[upd] = i
            unvisited[i] = False
        return prev

    def init_paths(self) -> None:
        """Build before/after trees and drop reference edges from the
        candidate set (km/utils/Graph.py:121-198 semantics, including the
        first-edge quirk noted in the module docstring)."""
        self.freeze()
        self.before = self._sweep(self.first_node, self.succ_ids, self.succ_w)
        self.after = self._sweep(self.last_node, self.pred_ids, self.pred_w)

        removed = 0
        curs = set(np.where(self.before == self.first_node)[0])
        for cur in curs:
            cur = int(cur)
            last_cur = None
            while self.after[cur] != -1:
                cur = int(self.after[cur])
                # NB: `last_cur and ...` — bug-compatible: node 0 (falsy)
                # never removes its outgoing edge, just like km.
                if last_cur and (last_cur, cur) in self.edge_set:
                    self.edge_set.remove((last_cur, cur))
                    log.debug("Removing (%d, %d)", last_cur, cur)
                    removed += 1
                last_cur = cur
        log.info("Removed %d ref edges.", removed)

    def _splice(self, a: int, b: int):
        """Shortest source->sink path through edge (a, b), or None."""
        path = [b, a]
        cur = a
        while self.before[cur] != -1:
            cur = int(self.before[cur])
            path.append(cur)
        path.reverse()
        cur = b
        while self.after[cur] != -1:
            cur = int(self.after[cur])
            path.append(cur)
        if path[0] != self.first_node or path[-1] != self.last_node:
            return None
        return tuple(path)

    def all_shortest(self) -> list[tuple[int, ...]]:
        """Unique spliced paths through all surviving candidate edges,
        in deterministic (sorted) order."""
        log.info("%d edges in non-ref edge set.", len(self.edge_set))
        paths = set()
        for (i, j) in sorted(self.edge_set):
            log.debug("Computing shortest path through edge: (%d, %d)", i, j)
            p = self._splice(i, j)
            if p:
                paths.add(p)
        return sorted(paths)
