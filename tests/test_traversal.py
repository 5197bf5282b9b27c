"""BFS family vs NumPy golden BFS."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.operators.traversal import (
    bfs,
    closeness_centrality,
    eccentricity,
    multi_source_bfs,
)


def _golden_bfs(src, dst, n, source):
    from collections import deque

    adj = [[] for _ in range(n)]
    for u, v in zip(src.tolist(), dst.tolist()):
        adj[u].append(v)
    dist = {source: 0}
    q = deque([source])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_matches_golden(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    gold = _golden_bfs(src, dst, 300, 17)
    got = bfs(g_rand, 17).toPandas().set_index("id")["dist"].to_dict()
    assert got == gold


def test_multi_source_bfs(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    sources = [0, 17, 42]
    res = multi_source_bfs(g_rand, sources).toPandas()
    for s in sources:
        gold = _golden_bfs(src, dst, 300, s)
        got = res[res["source"] == s].set_index("id")["dist"].to_dict()
        assert got == gold, f"source {s}"


def test_filtered_bfs(g_rand):
    # fbfs analogue: traversal restricted to even vertex ids
    res = bfs(g_rand, 0, vertex_filter=(F.col("id") % 2 == 0)).toPandas()
    visited = res[res["dist"] > 0]
    assert (visited["id"] % 2 == 0).all()


def test_frontier_bfs_high_diameter_path(spark):
    """40-level path through the frontier-join path: exercises the
    periodic visited-union coalescing (plan stays bounded) and the exact
    per-level distances."""
    from approximate_pagerank_public_spark.plans.graph import Graph

    n = 41
    g = Graph.from_edge_arrays(
        spark, list(range(n - 1)), list(range(1, n)), num_vertices=n, num_partitions=4
    )
    res = multi_source_bfs(g, [0]).toPandas().set_index("id")["dist"]
    assert len(res) == n
    assert all(res[i] == i for i in range(n))
    g.unpersist()


def test_closeness_and_eccentricity(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    sources = [17, 42]
    cc = closeness_centrality(g_rand, sources).toPandas().set_index("source")["closeness"]
    ec = eccentricity(g_rand, sources).toPandas().set_index("source")["ecc"]
    for s in sources:
        gold = _golden_bfs(src, dst, 300, s)
        level_sum = sum(gold.values())
        assert abs(cc[s] - (1.0 / level_sum if level_sum else 0.0)) < 1e-12
        assert ec[s] == max(gold.values())


def _golden_fbfs(src, dst, n, root, skip=9):
    """fbfs.gm twin under the engine's pinned (level, id) visit order."""
    gold = _golden_bfs(src, dst, n, root)
    order = sorted(gold, key=lambda v: (gold[v], v))
    out = {}
    for cnt, v in enumerate(order):
        if cnt >= skip:
            out[v] = (gold[v], 2 * cnt + 1)
        else:
            out[v] = (0 if v == root else None, 0)
    for v in range(n):
        out.setdefault(v, (None, 0))
    return out


def test_filtered_bfs_fbfs_semantics(g_rand):
    from approximate_pagerank_public_spark.operators.traversal import filtered_bfs

    src, dst, _ = g_rand.edges_numpy()
    gold = _golden_fbfs(src, dst, 300, 17)
    res = filtered_bfs(g_rand, 17).toPandas()
    assert len(res) == 300
    for _, row in res.iterrows():
        gd, gp = gold[row["id"]]
        got_d = None if row.isna()["dist"] else int(row["dist"])
        assert got_d == gd, f"id {row['id']}: dist {got_d} != {gd}"
        assert int(row["prop"]) == gp, f"id {row['id']}: prop"


def test_filtered_bfs_small_reach_all_skipped(g5):
    """A root reaching < skip_first vertices writes nothing but its own
    unconditional dist=0 (fbfs.gm:9)."""
    from approximate_pagerank_public_spark.operators.traversal import filtered_bfs

    res = filtered_bfs(g5, 1).toPandas().set_index("id")
    assert (res["prop"] == 0).all()
    assert res.loc[1, "dist"] == 0
    assert res.drop(index=1)["dist"].isna().all()


def test_block_bfs_matches_frontier_bfs(g_rand):
    from approximate_pagerank_public_spark.operators.traversal import (
        multi_source_bfs,
        multi_source_bfs_block,
    )

    sources = [0, 5, 250]
    a = multi_source_bfs(g_rand, sources).toPandas()
    b = multi_source_bfs_block(g_rand, sources).toPandas()
    key = ["source", "id", "dist"]
    assert sorted(map(tuple, a[key].values)) == sorted(map(tuple, b[key].values))


def test_block_bfs_dense_frontier_path_matches_sparse(g_rand, monkeypatch):
    """The dense |E|-mask gather and the sparse src-index lookup are
    alternate selection strategies inside frontier_min_relax — force
    each and require identical distances (small graphs otherwise always
    take the sparse path, leaving dense untested)."""
    from approximate_pagerank_public_spark.operators import traversal

    sources = [0, 7]
    sparse = traversal.multi_source_bfs_block(g_rand, sources).toPandas()
    monkeypatch.setattr(traversal, "_sparse_threshold", lambda n: -1)
    dense = traversal.multi_source_bfs_block(g_rand, sources).toPandas()
    key = ["source", "id", "dist"]
    assert sorted(map(tuple, sparse[key].values)) == sorted(
        map(tuple, dense[key].values)
    )


def test_approx_diameter_double_sweep(g_rand):
    from approximate_pagerank_public_spark.operators.traversal import approx_diameter

    src, dst, _ = g_rand.edges_numpy()
    d0 = _golden_bfs(src, dst, 300, 0)
    peak = min(v for v in d0 if d0[v] == max(d0.values()))
    d1 = _golden_bfs(src, dst, 300, peak)
    row = approx_diameter(g_rand, 0).first()
    assert row["start"] == 0
    assert row["peak"] == peak
    assert row["diameter_lb"] == max(d1.values())


def test_harmonic_centrality_golden_and_path_parity(g_rand, spark, monkeypatch):
    from approximate_pagerank_public_spark.operators.traversal import (
        harmonic_centrality,
    )

    src, dst, _ = g_rand.edges_numpy()
    sources = [17, 42, 295]  # 295 is dangling (reaches nothing)
    hc = harmonic_centrality(g_rand, sources).toPandas().set_index("source")["harmonic"]
    for s in sources:
        gold = _golden_bfs(src, dst, 300, s)
        # same pinned fold: histogram, ascending-d
        from collections import Counter

        hist = Counter(d for v, d in gold.items() if d > 0)
        want = 0.0
        for d in sorted(hist):
            want += hist[d] / d
        assert abs(hc[s] - want) < 1e-12, s
    # distributed DataFrame twin must agree bit-for-bit
    import approximate_pagerank_public_spark.plans.graph as graphmod

    monkeypatch.setattr(
        type(g_rand), "blocks", property(lambda self: None), raising=True
    )
    hc2 = (
        harmonic_centrality(g_rand, sources).toPandas().set_index("source")["harmonic"]
    )
    for s in sources:
        assert hc2[s] == hc[s], s
