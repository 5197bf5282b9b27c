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
