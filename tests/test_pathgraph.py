"""Batched device Dijkstra sweeps (ops.pathgraph) vs the host scan-min
spec (models.pathfinder._sweep). The device sweep must produce EQUAL
predecessor trees — same tie-breaking, same float32 accumulation — not
merely equal distances."""

import os

import numpy as np
import pytest

from km_tpu.io.fasta import read_target
from km_tpu.models.finder import VariantFinder
from km_tpu.models.pathfinder import OverlapGraph
from km_tpu.models.sequence import TargetSeq
from km_tpu.models.table import CountTable
from km_tpu.ops.pathgraph import batched_alt_paths, batched_sweeps

from helpers import REFDATA

FIXTURES = [
    ("02H025_NPM1.jf", "NPM1_4ins_exons_10-11utr.fa"),
    ("02H033_DNMT3A_sub.jf", "DNMT3A_R882_exon_23.fa"),
    ("03H112_IandI.jf", "FLT3-ITD_exons_13-15.fa"),
    ("03H116_ITD.jf", "FLT3-ITD_exons_13-15.fa"),
    ("05H094_FLT3-TKD_del.jf", "FLT3-TKD_exon_20.fa"),
]


def _finder(jf, fa):
    tab = CountTable.from_jf(os.path.join(REFDATA, "jf", jf))
    seqs, _ = read_target(os.path.join(REFDATA, "catalog/GRCh38", fa))
    t = TargetSeq("".join(seqs), os.path.splitext(fa)[0], tab.k)
    return VariantFinder(t, tab)


def _host_trees(g):
    return (g._sweep(g.first_node, g.succ_ptr, g.succ_ids, g.succ_w),
            g._sweep(g.last_node, g.pred_ptr, g.pred_ids, g.pred_w))


def test_fixture_trees_equal():
    graphs = []
    for jf, fa in FIXTURES:
        g = _finder(jf, fa).build_graph()
        g.freeze()
        graphs.append(g)
    dev = batched_sweeps(graphs)
    for g, (db, da) in zip(graphs, dev):
        hb, ha = _host_trees(g)
        assert np.array_equal(hb, db)
        assert np.array_equal(ha, da)


def test_fixture_alt_paths_equal():
    for jf, fa in FIXTURES:
        f_host = _finder(jf, fa)
        f_host.find_alt_paths()
        f_dev = _finder(jf, fa)
        batched_alt_paths([f_dev])
        assert f_dev.alt_paths == f_host.alt_paths


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_trees_equal(seed):
    """Adversarial property test: random sparse digraphs with heavy tie
    pressure (all weights 1 or 0.01) across mixed sizes in one batch."""

    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(12):
        n_real = int(rng.integers(3, 90))
        g = OverlapGraph.__new__(OverlapGraph)
        g.n_real = n_real
        g.n = n_real + 2
        g.first_node = n_real
        g.last_node = n_real + 1
        g.k = 31
        g._src, g._dst, g._w = [], [], []
        n_edges = int(rng.integers(1, 6 * g.n))
        for _e in range(n_edges):
            i = int(rng.integers(0, g.n))
            j = int(rng.integers(0, g.n))
            if i == j:
                continue
            g.set_edge(i, j, 0.01 if rng.random() < 0.3 else 1.0)
        g.freeze()
        graphs.append(g)

    dev = batched_sweeps(graphs)
    for g, (db, da) in zip(graphs, dev):
        hb, ha = _host_trees(g)
        assert np.array_equal(hb, db), (g.n, np.where(hb != db))
        assert np.array_equal(ha, da), (g.n, np.where(ha != da))


def _random_graph(rng, n_real, weights, max_extra_deg=5):
    g = OverlapGraph.__new__(OverlapGraph)
    g.n_real = n_real
    g.n = n_real + 2
    g.first_node = n_real
    g.last_node = n_real + 1
    g.k = 31
    g._src, g._dst, g._w = [], [], []
    n_edges = int(rng.integers(1, max_extra_deg * g.n))
    for _e in range(n_edges):
        i = int(rng.integers(0, g.n))
        j = int(rng.integers(0, g.n))
        if i == j:
            continue
        g.set_edge(i, j, float(rng.choice(weights)))
    g.freeze()
    return g


def test_outlier_graphs_do_not_degrade_neighbors():
    """A >PALETTE-weight graph and a wide-degree graph in the same batch
    fall back alone; every other graph still returns exact trees (the
    round-3 advisor's merged-dispatch finding)."""
    from km_tpu.ops import pathgraph

    rng = np.random.default_rng(7)
    normal = [_random_graph(rng, int(rng.integers(5, 60)), [1.0, 0.01])
              for _ in range(6)]

    # outlier 1: more distinct edge weights than the palette holds
    many_w = [float(w) for w in np.linspace(0.01, 2.0,
                                            pathgraph.PALETTE + 4)]
    weird = _random_graph(rng, 40, many_w)

    # outlier 2: one node with out-degree above MAX_WIDTH
    wide = OverlapGraph.__new__(OverlapGraph)
    wide.n_real = pathgraph.MAX_WIDTH + 10
    wide.n = wide.n_real + 2
    wide.first_node = wide.n_real
    wide.last_node = wide.n_real + 1
    wide.k = 31
    wide._src, wide._dst, wide._w = [], [], []
    for j in range(pathgraph.MAX_WIDTH + 5):
        wide.set_edge(wide.first_node, j, 1.0)
        wide.set_edge(j, wide.last_node, 1.0)
    wide.freeze()

    graphs = normal[:3] + [weird] + normal[3:] + [wide]
    dev = batched_sweeps(graphs)
    for g, (db, da) in zip(graphs, dev):
        hb, ha = _host_trees(g)
        assert np.array_equal(hb, db)
        assert np.array_equal(ha, da)


def test_max_node_scale_graph_runs_on_device():
    """A graph at km's legal ceiling (`-n 10000`,
    reference: km/argparser/find_mutation.py:33-39) must take the
    device sweep — not silently fall back to the host O(N^2) loop —
    and return exact predecessor trees (the int32 packing tier past
    MAX_INT16_NODES)."""
    import logging

    from km_tpu.ops import pathgraph

    rng = np.random.default_rng(13)
    g = _random_graph(rng, 10000, [1.0, 0.01], max_extra_deg=3)
    assert g.n > pathgraph.MAX_INT16_NODES
    assert g.n <= pathgraph.MAX_DEVICE_NODES

    records = []

    class Catch(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = Catch()
    logging.getLogger().addHandler(h)
    try:
        dev = batched_sweeps([g])
    finally:
        logging.getLogger().removeHandler(h)
    assert not any("host sweep" in m for m in records), records

    hb, ha = _host_trees(g)
    db, da = dev[0]
    assert np.array_equal(hb, db)
    assert np.array_equal(ha, da)


def test_mixed_width_graphs_group_by_lane_width():
    """Graphs of different max degree still return exact trees when
    batched together (grouping never mixes lane widths)."""
    rng = np.random.default_rng(11)
    graphs = [_random_graph(rng, 30, [1.0, 0.01], max_extra_deg=2),
              _random_graph(rng, 30, [1.0, 0.01], max_extra_deg=12),
              _random_graph(rng, 500, [1.0, 0.01], max_extra_deg=2),
              _random_graph(rng, 700, [1.0, 0.01], max_extra_deg=2)]
    dev = batched_sweeps(graphs)
    for g, (db, da) in zip(graphs, dev):
        hb, ha = _host_trees(g)
        assert np.array_equal(hb, db)
        assert np.array_equal(ha, da)
