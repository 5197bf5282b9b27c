"""SCC vs an iterative Tarjan golden + broadcast/distributed parity."""

import numpy as np

from approximate_pagerank_public_spark.operators.scc import (
    strongly_connected_components,
)
from approximate_pagerank_public_spark.plans.graph import Graph


def _golden_scc_min_labels(src, dst, n):
    """Iterative Tarjan; label = min vertex id per SCC."""
    adj = [[] for _ in range(n)]
    for u, v in zip(src.tolist(), dst.tolist()):
        adj[u].append(v)
    index = [-1] * n
    low = [0] * n
    on_stack = [False] * n
    stack: list[int] = []
    label = [0] * n
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if on_stack[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return label


def test_scc_g5_golden(g5):
    # g5 edges: 1→0, 1→3, 2→0, 2→1, 3→2, 4→3 ⇒ cycle {1,3,2}; 0, 4 singletons
    got = (
        strongly_connected_components(g5, mode="broadcast")
        .toPandas()
        .sort_values("id")["scc"]
        .tolist()
    )
    assert got == [0, 1, 1, 1, 4]


def test_scc_matches_tarjan_golden(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    gold = _golden_scc_min_labels(src, dst, 300)
    got = (
        strongly_connected_components(g_rand, mode="broadcast")
        .toPandas()
        .sort_values("id")["scc"]
        .tolist()
    )
    assert got == gold


def test_scc_path_graph_all_singletons(spark):
    n = 40
    g = Graph.from_edge_arrays(
        spark, list(range(n - 1)), list(range(1, n)), num_vertices=n, num_partitions=4
    )
    try:
        got = (
            strongly_connected_components(g, mode="broadcast")
            .toPandas()
            .sort_values("id")["scc"]
            .tolist()
        )
        assert got == list(range(n))
    finally:
        g.unpersist()


def test_scc_broadcast_distributed_parity(g_rand):
    b = (
        strongly_connected_components(g_rand, mode="broadcast")
        .toPandas()
        .sort_values("id")
    )
    d = (
        strongly_connected_components(g_rand, mode="distributed")
        .toPandas()
        .sort_values("id")
    )
    assert b["id"].tolist() == d["id"].tolist()
    assert b["scc"].tolist() == d["scc"].tolist()


def test_bowtie_hand_golden_and_parity(spark):
    """Classic bow-tie: 2-cycle core, IN feeder, OUT sink, tendril off
    the IN side, disconnected pair."""
    from approximate_pagerank_public_spark.operators.scc import (
        bowtie_decomposition,
    )
    from approximate_pagerank_public_spark.plans.graph import Graph

    edges = [(0, 1), (1, 0), (2, 0), (1, 3), (2, 4), (5, 6)]
    src, dst = zip(*edges)
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=7, num_partitions=4)
    try:
        expect = {
            0: "CORE", 1: "CORE", 2: "IN", 3: "OUT", 4: "TENDRIL",
            5: "DISCONNECTED", 6: "DISCONNECTED",
        }
        for mode in ("broadcast", "distributed"):
            got = {
                int(r["id"]): r["cls"]
                for r in bowtie_decomposition(g, mode=mode).collect()
            }
            assert got == expect, mode
    finally:
        g.unpersist()


def test_dag_longest_path_hand_golden(spark):
    from approximate_pagerank_public_spark.operators.scc import dag_longest_path
    import pandas as pd
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        pd.DataFrame({"src": [0, 1, 0], "dst": [1, 2, 2]})
    )
    nodes = spark.createDataFrame(pd.DataFrame({"id": [0, 1, 2, 3]}))
    got = {
        int(r["id"]): int(r["longest"])
        for r in dag_longest_path(e, nodes).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 0}
