"""MSF: Kruskal (broadcast) vs distributed Borůvka edge-set parity,
forest properties (acyclic, spanning), and weight optimality spot
check against brute force on a small graph."""

import numpy as np

from approximate_pagerank_public_spark.operators.msf import (
    kruskal_numpy,
    minimum_spanning_forest,
    undirected_weighted_edges,
)
from approximate_pagerank_public_spark.plans.graph import Graph


def _edge_set(df):
    return {(r["u"], r["v"], r["w"]) for r in df.collect()}


def test_msf_paths_identical_edge_sets(g_rand):
    b = minimum_spanning_forest(g_rand, mode="broadcast")
    d = minimum_spanning_forest(g_rand, mode="distributed")
    assert _edge_set(b) == _edge_set(d)


def test_msf_is_spanning_forest(g_rand):
    msf = minimum_spanning_forest(g_rand, mode="broadcast").toPandas()
    # component count of the undirected graph via union-find
    pdf = undirected_weighted_edges(g_rand).toPandas()
    parent = list(range(g_rand.num_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    touched = set()
    for u, v in zip(pdf["u"], pdf["v"]):
        touched |= {u, v}
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    n_comp = len({find(int(x)) for x in touched})
    # a spanning forest over the touched vertices has |touched| - n_comp edges
    assert len(msf) == len(touched) - n_comp
    # acyclic: re-running union-find over ONLY msf edges joins every time
    parent = list(range(g_rand.num_vertices))
    for u, v in zip(msf["u"], msf["v"]):
        ru, rv = find(int(u)), find(int(v))
        assert ru != rv, f"cycle at ({u}, {v})"
        parent[max(ru, rv)] = min(ru, rv)


def test_msf_weight_optimal_small(spark):
    # 4-vertex diamond with a heavy diagonal: MST must skip it
    src = np.array([0, 0, 1, 2, 0], dtype=np.int64)
    dst = np.array([1, 2, 3, 3, 3], dtype=np.int64)
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=4, num_partitions=2)
    try:
        # directed weights are 1/outdeg: vertex 0 has outdeg 3 -> w=1/3
        # for (0,1),(0,2),(0,3); vertices 1,2 have outdeg 1 -> w=1
        msf = minimum_spanning_forest(g, mode="broadcast").toPandas()
        got = {(r.u, r.v) for r in msf.itertuples()}
        # cheapest tree: the three 1/3-weight edges from 0
        assert got == {(0, 1), (0, 2), (0, 3)}
    finally:
        g.unpersist()


def test_kruskal_golden_unique_order():
    u = np.array([0, 0, 1], dtype=np.int64)
    v = np.array([1, 2, 2], dtype=np.int64)
    w = np.array([1.0, 1.0, 1.0])
    keep = kruskal_numpy(u, v, w)
    # ties broken by (u, v): edges (0,1) and (0,2) win
    assert list(keep) == [True, True, False]


def test_affinity_clusters_paths_and_coarsening(g_rand):
    from approximate_pagerank_public_spark.operators.msf import (
        affinity_clusters,
    )

    b1 = affinity_clusters(g_rand, rounds=1, mode="broadcast").toPandas()
    d1 = affinity_clusters(g_rand, rounds=1, mode="distributed").toPandas()
    m1 = dict(zip(b1["id"], b1["cluster"]))
    assert m1 == dict(zip(d1["id"], d1["cluster"]))
    b2 = affinity_clusters(g_rand, rounds=2, mode="broadcast").toPandas()
    m2 = dict(zip(b2["id"], b2["cluster"]))
    # coarsening: round-2 clusters refine-merge round-1 clusters — every
    # round-1 cluster maps entirely into one round-2 cluster
    agg = {}
    for vid, c1 in m1.items():
        agg.setdefault(c1, set()).add(m2[vid])
    assert all(len(s) == 1 for s in agg.values())
    # fewer (or equal) clusters after more rounds
    assert len(set(m2.values())) <= len(set(m1.values()))
