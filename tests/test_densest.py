"""Densest subgraph (greedy peel, Bahmani et al.): broadcast vs
distributed path parity, a clique-plus-tail graph where the densest
subgraph is a proper subset, and internal consistency of the reported
(best_round, best_vertices, best_edges) against the memberships."""

import numpy as np

from approximate_pagerank_public_spark.operators.densest import (
    densest_subgraph,
    peel_densest_numpy,
)
from approximate_pagerank_public_spark.plans.graph import Graph


def _rows(df):
    return sorted(
        (r["id"], r["round_removed"], r["in_densest"]) for r in df.collect()
    )


def test_densest_paths_identical(g_rand):
    b = densest_subgraph(g_rand, mode="broadcast")
    d = densest_subgraph(g_rand, mode="distributed")
    assert _rows(b.memberships()) == _rows(d.memberships())
    assert (b.rounds, b.best_round, b.best_vertices, b.best_edges) == (
        d.rounds,
        d.best_round,
        d.best_vertices,
        d.best_edges,
    )


def test_densest_clique_plus_tail(spark):
    # K8 (density 3.5) + a 30-vertex path tail hanging off vertex 0:
    # the peel must end up on the clique, never the tail.
    k = 8
    src, dst = [], []
    for i in range(k):
        for j in range(i + 1, k):
            src.append(i)
            dst.append(j)
    for t in range(k, k + 30):
        src.append(t - 1 if t > k else 0)
        dst.append(t)
    g = Graph.from_edge_arrays(
        spark,
        np.array(src, dtype=np.int64),
        np.array(dst, dtype=np.int64),
        num_vertices=k + 30,
        num_partitions=4,
    )
    try:
        res = densest_subgraph(g, mode="broadcast")
        members = {
            r["id"]
            for r in res.memberships().where("in_densest = 1").collect()
        }
        assert set(range(k)) <= members
        # 2(1+eps)-approx with eps=1/8: reported density >= (max=3.5)/2.25
        assert res.best_edges / res.best_vertices >= 3.5 / 2.25
        # tail interior vertices (degree <= 2) can't be in a subgraph
        # of density >= 1.56
        assert all(m < k or m == k for m in members)
    finally:
        g.unpersist()


def test_densest_best_stats_match_memberships(g_rand):
    res = densest_subgraph(g_rand, mode="broadcast")
    pdf = res.memberships().toPandas()
    survivors = set(
        pdf.loc[pdf.round_removed >= res.best_round, "id"].tolist()
    )
    assert len(survivors) == res.best_vertices
    assert set(pdf.loc[pdf.in_densest == 1, "id"]) == survivors
    # recount edges inside the best subgraph from the raw edge table
    e = g_rand.edges.select("src", "dst").toPandas()
    pairs = {
        (min(a, b), max(a, b))
        for a, b in zip(e.src, e.dst)
        if a != b and a in survivors and b in survivors
    }
    assert len(pairs) == res.best_edges


def test_peel_terminates_and_covers_domain():
    # every vertex incident to an edge gets a removal round
    rng = np.random.default_rng(7)
    u = rng.integers(0, 50, 300).astype(np.int64)
    v = rng.integers(0, 50, 300).astype(np.int64)
    keep = u != v
    cu, cv = np.minimum(u[keep], v[keep]), np.maximum(u[keep], v[keep])
    rr, best_r, bv, be, rounds = peel_densest_numpy(cu, cv, 60)
    touched = np.zeros(60, dtype=bool)
    touched[cu] = True
    touched[cv] = True
    assert (rr[touched] >= 0).all() and (rr[~touched] == -1).all()
    assert 0 <= best_r < rounds
    assert bv == int((rr >= best_r).sum())
