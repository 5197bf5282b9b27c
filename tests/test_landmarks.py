"""Landmark distance sketches: upper-bound property vs exact BFS,
exactness when an endpoint is a landmark, deterministic pick."""

import numpy as np

from approximate_pagerank_public_spark.operators.landmarks import (
    landmark_distance_estimates,
    pick_landmarks,
)


def _exact_dists(src, dst, n, sources):
    """Exact BFS distances from each source over out-edges."""
    adj = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        adj[s].append(d)
    out = {}
    for s0 in sources:
        dist = {s0: 0}
        frontier = [s0]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            frontier = nxt
        out[s0] = dist
    return out


def test_pick_landmarks_is_topk_indegree(g_rand):
    lms = pick_landmarks(g_rand, 4)
    src, dst, _ = g_rand.edges_numpy()
    indeg = np.bincount(dst, minlength=g_rand.num_vertices)
    order = sorted(range(g_rand.num_vertices), key=lambda v: (-indeg[v], v))
    want = [v for v in order if indeg[v] > 0][:4]
    assert lms == want


def test_estimates_are_upper_bounds_and_exact_at_landmarks(g_rand, spark):
    n = g_rand.num_vertices
    src, dst, _ = g_rand.edges_numpy()
    lms = pick_landmarks(g_rand, 4)
    ids = sorted(set(range(6)) | set(lms[:2]))
    pairs = spark.createDataFrame(
        [(u, v) for u in ids for v in ids if u != v], "u long, v long"
    )
    got = {
        (r["u"], r["v"]): r["d_est"]
        for r in landmark_distance_estimates(g_rand, pairs, k=4).collect()
    }
    exact_from = _exact_dists(src, dst, n, ids)
    for (u, v), est in got.items():
        d = exact_from[u].get(v)
        if est == -1:
            # no landmark connects them; if reachable at all, no
            # shortest path through any landmark was found — allowed
            continue
        assert d is not None, f"estimate {est} for unreachable pair {(u, v)}"
        assert est >= d, f"{(u, v)}: est {est} < exact {d}"
        if u in lms or v in lms:
            assert est == d, f"landmark endpoint pair {(u, v)} not exact"


def test_unreachable_pairs_get_minus_one(spark):
    import numpy as np

    from approximate_pagerank_public_spark.plans.graph import Graph

    # 0→1, 2→3: pairs across the two components are unreachable
    g = Graph.from_edge_arrays(
        spark,
        np.array([0, 2], dtype=np.int64),
        np.array([1, 3], dtype=np.int64),
        num_vertices=4,
        num_partitions=2,
    )
    try:
        pairs = spark.createDataFrame([(0, 3), (0, 1)], "u long, v long")
        got = {
            (r["u"], r["v"]): r["d_est"]
            for r in landmark_distance_estimates(g, pairs, k=2).collect()
        }
        assert got[(0, 3)] == -1
        # landmarks are the two in-degree-1 vertices 1 and 3: d(0,1)=1
        # goes through landmark 1 itself, so it is exact
        assert got[(0, 1)] == 1
    finally:
        g.unpersist()
