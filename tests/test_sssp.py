"""Weighted SSSP vs a pure-Python Dijkstra golden + path bit-parity."""

import heapq

import numpy as np

from approximate_pagerank_public_spark.operators.sssp import sssp


def _golden_dijkstra(src, dst, w, n, source):
    adj = [[] for _ in range(n)]
    for u, v, x in zip(src.tolist(), dst.tolist(), w.tolist()):
        adj[u].append((v, x))
    dist = {source: 0.0}
    heap = [(0.0, source)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, np.inf):
            continue
        for v, x in adj[u]:
            nd = d + x
            if nd < dist.get(v, np.inf):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


def test_sssp_matches_dijkstra_golden(g_rand):
    src, dst, w = g_rand.edges_numpy()
    gold = _golden_dijkstra(src, dst, w, 300, 17)
    got = sssp(g_rand, 17, mode="broadcast").toPandas()
    got_d = dict(zip(got["id"].tolist(), got["dist"].tolist()))
    assert set(got_d) == set(gold)
    for v, d in gold.items():
        # min-plus fixpoint is exact: same adds, same mins
        assert abs(got_d[v] - d) < 1e-12, v


def test_sssp_unreachable_vertices_absent(g5):
    # g5: vertex 0 is dangling (no out-edges) — from 0 only itself reached
    got = sssp(g5, 0, mode="broadcast").toPandas()
    assert got["id"].tolist() == [0]
    assert got["dist"].tolist() == [0.0]


def test_sssp_broadcast_distributed_bit_parity(g_rand):
    b = sssp(g_rand, 17, mode="broadcast").toPandas().sort_values("id")
    d = sssp(g_rand, 17, mode="distributed").toPandas().sort_values("id")
    assert b["id"].tolist() == d["id"].tolist()
    # bit-identical (min over identical single-add candidates)
    assert b["dist"].to_numpy().tobytes() == d["dist"].to_numpy().tobytes()


def test_sssp_multi_source_min_of_singles(g_rand):
    src, dst, w = g_rand.edges_numpy()
    g17 = _golden_dijkstra(src, dst, w, 300, 17)
    g42 = _golden_dijkstra(src, dst, w, 300, 42)
    got = sssp(g_rand, [17, 42], mode="broadcast").toPandas()
    got_d = dict(zip(got["id"].tolist(), got["dist"].tolist()))
    for v in set(g17) | set(g42):
        assert abs(got_d[v] - min(g17.get(v, np.inf), g42.get(v, np.inf))) < 1e-12
