"""WL color refinement vs a pure-Python replay of the same md5 chain."""

import hashlib

from approximate_pagerank_public_spark.operators.wlhash import wl_refinement
from approximate_pagerank_public_spark.plans.graph import Graph


def _h28(lab: int) -> int:
    return int(hashlib.md5(f"wl:{lab}".encode()).hexdigest()[:7], 16)


def _h60(lab: int, ns: int) -> int:
    return int(hashlib.md5(f"{lab}:{ns}".encode()).hexdigest()[:15], 16)


def _wl_python(src, dst, n_vertices, rounds):
    adj = {v: set() for v in range(n_vertices)}
    for u, v in zip(src, dst):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    lab = {v: len(adj[v]) for v in adj}
    for _ in range(rounds):
        h = {v: _h28(lab[v]) for v in adj}
        lab = {v: _h60(lab[v], sum(h[u] for u in adj[v])) for v in adj}
    return lab


def test_wl_matches_python_replay(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    gold = _wl_python(src.tolist(), dst.tolist(), 300, rounds=3)
    got = {r["id"]: r["wl"] for r in wl_refinement(g_rand, rounds=3).collect()}
    assert got == gold


def test_wl_distinguishes_structure_not_ids(spark):
    # two disjoint triangles + one path of 3: triangle vertices share a
    # color class regardless of ids; path midpoint differs from ends
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (5, 6), (6, 7)]
    src, dst = zip(*edges)
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=13, num_partitions=2)
    wl = {r["id"]: r["wl"] for r in wl_refinement(g, rounds=3).collect()}
    tri_colors = {wl[v] for v in (0, 1, 2, 10, 11, 12)}
    assert len(tri_colors) == 1
    assert wl[5] == wl[7] != wl[6]
    assert wl[6] != next(iter(tri_colors))
    g.unpersist()
