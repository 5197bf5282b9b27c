"""Truss decomposition vs a pure-Python golden peel."""

from pyspark.sql import functions as F

from approximate_pagerank_public_spark.operators.triangles import (
    k_truss,
    truss_decomposition,
)


def _golden_trussness(src, dst):
    edges = {
        (min(a, b), max(a, b))
        for a, b in zip(src, dst)
        if a != b
    }
    out = {}
    k = 2
    while edges:
        k += 1
        thr = k - 2
        while True:
            adj = {}
            for u, v in edges:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
            kept = {(u, v) for u, v in edges if len(adj[u] & adj[v]) >= thr}
            if kept == edges:
                break
            for e in edges - kept:
                out[e] = k - 1
            edges = kept
    return out


def test_trussness_known_graph(spark):
    """K4 glued to a triangle and a pendant edge: K4 edges have
    trussness 4, the triangle's 3, the pendant 2."""
    from approximate_pagerank_public_spark.plans.graph import Graph

    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    tri = [(3, 4), (3, 5), (4, 5)]
    pend = [(5, 6)]
    src, dst = zip(*(k4 + tri + pend))
    g = Graph.from_edge_arrays(
        spark, list(src), list(dst), num_vertices=7, num_partitions=4
    )
    got = {
        (r["u"], r["v"]): r["trussness"]
        for r in truss_decomposition(g).collect()
    }
    want = {e: 4 for e in k4}
    want.update({e: 3 for e in tri})
    want.update({e: 2 for e in pend})
    assert got == want
    g.unpersist()


def test_trussness_matches_golden_random(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    want = _golden_trussness(src.tolist(), dst.tolist())
    got = {
        (r["u"], r["v"]): r["trussness"]
        for r in truss_decomposition(g_rand).collect()
    }
    assert got == want


def test_trussness_consistent_with_k_truss(g_rand):
    """Edges with trussness >= 4 are exactly the 4-truss."""
    t = truss_decomposition(g_rand)
    got = {
        (r["u"], r["v"])
        for r in t.where(F.col("trussness") >= 4).collect()
    }
    kt, _rounds = k_truss(g_rand, k=4)
    want = {(r["u"], r["v"]) for r in kt.collect()}
    assert got == want
