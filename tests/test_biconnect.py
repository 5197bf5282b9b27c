"""Bridges / 2-edge-connected components — truth vs brute force.

The XOR-sampling engine (operators/biconnect.py) is checked against a
per-edge brute force: an undirected edge is a bridge iff removing it
raises the union-find component count.  Also: broadcast/distributed
mode parity, and the all-bridges path-graph degenerate case.
"""

import numpy as np
import pytest

from approximate_pagerank_public_spark.operators.biconnect import (
    bridges,
    two_edge_components,
)
from approximate_pagerank_public_spark.plans.graph import Graph


class _UF:
    def __init__(self, n):
        self.p = list(range(n))

    def find(self, x):
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _und_pairs(edges):
    return sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})


def _n_components(n, pairs):
    uf = _UF(n)
    for a, b in pairs:
        uf.union(a, b)
    return len({uf.find(i) for i in range(n)}), uf


def _brute_bridges(n, pairs):
    base, _ = _n_components(n, pairs)
    out = []
    for e in pairs:
        cnt, _ = _n_components(n, [p for p in pairs if p != e])
        if cnt > base:
            out.append(e)
    return sorted(out)


def _brute_2ecc(n, pairs):
    br = set(_brute_bridges(n, pairs))
    _, uf = _n_components(n, [p for p in pairs if p not in br])
    # component label = min member id
    lab = {}
    for i in range(n):
        r = uf.find(i)
        lab[r] = min(lab.get(r, i), i)
    return sorted((i, lab[uf.find(i)]) for i in range(n))


@pytest.fixture(scope="module")
def g_bico(spark):
    """Random sparse graph with pendant chains — rich in bridges."""
    rng = np.random.default_rng(7)
    n = 120
    src = rng.integers(0, 80, 170)
    dst = rng.integers(0, 80, 170)
    keep = src != dst
    edges = list(zip(src[keep].tolist(), dst[keep].tolist()))
    # pendant chains 80-…-119 hanging off vertex 0 and 40 (all bridges)
    chain = [(0, 80)] + [(i, i + 1) for i in range(80, 99)]
    chain += [(40, 100)] + [(i, i + 1) for i in range(100, 119)]
    edges += chain
    s, d = zip(*edges)
    g = Graph.from_edge_arrays(spark, s, d, num_vertices=n, num_partitions=4)
    yield g, _und_pairs(edges), n
    g.unpersist()


def test_bridges_match_brute_force(g_bico):
    g, pairs, n = g_bico
    expect = _brute_bridges(n, pairs)
    got = sorted(map(tuple, bridges(g, mode="broadcast").collect()))
    assert got == expect


def test_bridges_mode_parity(g_bico):
    g, _pairs, _n = g_bico
    b = sorted(map(tuple, bridges(g, mode="broadcast").collect()))
    d = sorted(map(tuple, bridges(g, mode="distributed").collect()))
    assert b == d


def test_two_edge_components_match_brute_force(g_bico):
    g, pairs, n = g_bico
    expect = _brute_2ecc(n, pairs)
    got = sorted(map(tuple, two_edge_components(g, mode="broadcast").collect()))
    assert got == expect
    dist = sorted(
        map(tuple, two_edge_components(g, mode="distributed").collect())
    )
    assert dist == expect


def test_path_graph_all_bridges(spark):
    src = list(range(9))
    dst = list(range(1, 10))
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=10, num_partitions=4)
    try:
        got = sorted(map(tuple, bridges(g).collect()))
        assert got == [(i, i + 1) for i in range(9)]
        tec = sorted(map(tuple, two_edge_components(g).collect()))
        assert tec == [(i, i) for i in range(10)]
    finally:
        g.unpersist()


def test_cycle_graph_no_bridges(spark):
    src = list(range(10))
    dst = [(i + 1) % 10 for i in range(10)]
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=10, num_partitions=4)
    try:
        assert bridges(g).count() == 0
        tec = sorted(map(tuple, two_edge_components(g).collect()))
        assert tec == [(i, 0) for i in range(10)]
    finally:
        g.unpersist()
