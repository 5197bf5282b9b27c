"""k-core / coreness / clustering coefficient / link prediction:
brute-force NumPy goldens, path parity, and cross-consistency
(v ∈ k-core ⟺ coreness(v) ≥ k)."""

import math

import numpy as np
import pytest

from approximate_pagerank_public_spark.operators.kcore import (
    core_numbers,
    k_core,
    peel_layers,
)
from approximate_pagerank_public_spark.operators.linkpred import (
    link_prediction,
    resource_allocation,
)
from approximate_pagerank_public_spark.operators.triangles import (
    clustering_coefficient,
)


def _sym_simple(src, dst, n):
    """Undirected simple adjacency as a set of frozenset pairs."""
    pairs = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
    adj = [set() for _ in range(n)]
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    return adj


def _peel_coreness(adj):
    """Textbook coreness: repeatedly delete a minimum-degree vertex."""
    n = len(adj)
    deg = np.array([len(a) for a in adj])
    alive = deg > 0
    core = np.zeros(n, dtype=np.int64)
    cur = 0
    work = {v for v in range(n) if alive[v]}
    nbrs = [set(a) for a in adj]
    while work:
        v = min(work, key=lambda x: (deg[x], x))
        cur = max(cur, int(deg[v]))
        core[v] = cur
        work.remove(v)
        for u in nbrs[v]:
            nbrs[u].discard(v)
            deg[u] -= 1
        nbrs[v].clear()
    return core


def test_coreness_matches_peeling_golden(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    adj = _sym_simple(src, dst, g_rand.num_vertices)
    want = _peel_coreness(adj)
    got = core_numbers(g_rand).core_numbers().toPandas().sort_values("id")
    assert np.array_equal(got["core"].to_numpy(), want)


def test_coreness_path_parity(g_rand):
    b = core_numbers(g_rand, mode="broadcast")
    d = core_numbers(g_rand, mode="distributed")
    pb = b.core_numbers().toPandas().sort_values("id").reset_index(drop=True)
    pd_ = d.core_numbers().toPandas().sort_values("id").reset_index(drop=True)
    assert pb.equals(pd_)
    assert b.rounds == d.rounds


def test_kcore_consistent_with_coreness(g_rand):
    core = (
        core_numbers(g_rand)
        .core_numbers()
        .toPandas()
        .set_index("id")["core"]
    )
    for k in (2, 3, 4):
        got = k_core(g_rand, k).subgraph_vertices().toPandas()
        want_ids = sorted(core[core >= k].index)
        assert sorted(got["id"]) == want_ids
        if len(got):
            assert int(got["core_deg"].min()) >= k


def test_kcore_path_parity_and_rounds(g_rand):
    b = k_core(g_rand, 3, mode="broadcast")
    d = k_core(g_rand, 3, mode="distributed")
    pb = b.subgraph_vertices().toPandas().sort_values("id").reset_index(drop=True)
    pd_ = d.subgraph_vertices().toPandas().sort_values("id").reset_index(drop=True)
    assert pb.equals(pd_)
    assert b.rounds == d.rounds


def test_kcore_g5(g5):
    # g5 symmetrized: 0-1,0-2,1-2,1-3,2-3,3-4 — the 2-core is {0,1,2,3}
    got = k_core(g5, 2).subgraph_vertices().toPandas().sort_values("id")
    assert got["id"].tolist() == [0, 1, 2, 3]
    assert k_core(g5, 3).subgraph_vertices().count() == 0


def test_clustering_coefficient_golden(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    n = g_rand.num_vertices
    adj = _sym_simple(src, dst, n)
    got = (
        clustering_coefficient(g_rand)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert len(got) == n
    for v in range(0, n, 7):  # spot-check every 7th vertex exactly
        d = len(adj[v])
        tri = sum(
            1
            for i in adj[v]
            for j in adj[v]
            if i < j and j in adj[i]
        )
        row = got.iloc[v]
        assert int(row["deg"]) == d
        assert int(row["triangles"]) == tri
        want = 2.0 * tri / (d * (d - 1)) if d >= 2 else 0.0
        assert row["lcc"] == want  # single IEEE division — exact


def test_link_prediction_golden(g5):
    # sym simple g5: 0-1,0-2,1-2,1-3,2-3,3-4
    # non-adjacent pairs with >=2 common neighbors:
    #   (0,3): common {1,2} → cn=2, du=2,dv=3 → jacc=2/3, pa=6,
    #          aa = 1/ln3 + 1/ln3
    got = link_prediction(g5, min_common=2).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (int(r["u"]), int(r["v"])) == (0, 3)
    assert int(r["cn"]) == 2
    assert int(r["pa"]) == 6
    assert r["jaccard"] == 2.0 / 3.0
    assert r["aa"] == pytest.approx(2.0 / math.log(3.0), rel=1e-12)


def test_link_prediction_excludes_existing_edges(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    existing = {
        (min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d
    }
    got = link_prediction(g_rand, min_common=3).toPandas()
    assert len(got) > 0
    pairs = set(zip(got["u"].astype(int), got["v"].astype(int)))
    assert not (pairs & existing)
    assert (got["u"] < got["v"]).all()
    assert (got["cn"] >= 3).all()


def _py_peel_layers(adj, k):
    """Textbook simultaneous-removal onion layers on a set-adjacency."""
    alive = {v for v in range(len(adj)) if adj[v]}
    layer = {v: 0 for v in alive}
    nbrs = [set(a) for a in adj]
    rounds = 0
    while True:
        bad = {v for v in alive if len(nbrs[v] & alive) < k}
        if not bad:
            return layer, rounds
        rounds += 1
        for v in bad:
            layer[v] = rounds
        alive -= bad


def test_peel_layers_matches_python_golden(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    adj = _sym_simple(src, dst, g_rand.num_vertices)
    want, want_rounds = _py_peel_layers(adj, 3)
    df, rounds = peel_layers(g_rand, 3, mode="broadcast")
    got = {
        int(r["id"]): int(r["layer"]) for _, r in df.toPandas().iterrows()
    }
    assert got == want
    assert rounds == want_rounds


def test_peel_layers_path_parity(g_rand):
    b, rb = peel_layers(g_rand, 3, mode="broadcast")
    d, rd = peel_layers(g_rand, 3, mode="distributed")
    assert rb == rd
    bp = b.orderBy("id").toPandas()
    dp = d.orderBy("id").toPandas()
    assert bp["id"].tolist() == dp["id"].tolist()
    assert bp["layer"].tolist() == dp["layer"].tolist()


def test_peel_layers_consistent_with_kcore(g_rand):
    df, _ = peel_layers(g_rand, 3, mode="broadcast")
    got = df.toPandas()
    core_ids = set(
        k_core(g_rand, 3, mode="broadcast")
        .subgraph_vertices()
        .toPandas()["id"]
        .astype(int)
    )
    in_core = set(got[got["layer"] == 0]["id"].astype(int))
    assert in_core == core_ids


def test_resource_allocation_golden(g5):
    # sym simple g5: 0-1,0-2,1-2,1-3,2-3,3-4 — the only non-adjacent
    # pair with >=2 common neighbors is (0,3) via {1,2}, deg(1)=deg(2)=3
    # → ra_micro = 2 * (1000000 // 3) = 666666
    got = resource_allocation(g5, min_common=2).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (int(r["u"]), int(r["v"])) == (0, 3)
    assert int(r["cn"]) == 2
    assert int(r["ra_micro"]) == 2 * (1_000_000 // 3)


def test_resource_allocation_matches_python_replay(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    adj = _sym_simple(src, dst, g_rand.num_vertices)
    existing = {
        (min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d
    }
    want = {}
    n = len(adj)
    for w in range(n):
        nbrs = sorted(adj[w])
        ra_w = 1_000_000 // len(nbrs) if nbrs else 0
        for i, u in enumerate(nbrs):
            for v in nbrs[i + 1 :]:
                cn, ra = want.get((u, v), (0, 0))
                want[(u, v)] = (cn + 1, ra + ra_w)
    want = {
        p: s
        for p, s in want.items()
        if s[0] >= 3 and p not in existing
    }
    got = resource_allocation(g_rand, min_common=3).toPandas()
    got_map = {
        (int(r["u"]), int(r["v"])): (int(r["cn"]), int(r["ra_micro"]))
        for _, r in got.iterrows()
    }
    assert got_map == want


def _py_ktruss(pairs, k):
    """Brute-force peel on a set of canonical (u<v) pairs."""
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    thr = k - 2
    while True:
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        sup = {
            (u, v): len(adj[u] & adj[v])
            for u, v in edges
        }
        nxt = {e for e in edges if sup[e] >= thr}
        if nxt == edges:
            return edges
        edges = nxt


def test_k_truss_matches_bruteforce(g_rand):
    from approximate_pagerank_public_spark.operators.triangles import k_truss

    src, dst, _ = g_rand.edges_numpy()
    pairs = list(zip(src.tolist(), dst.tolist()))
    for k in (3, 4):
        got_df, rounds = k_truss(g_rand, k=k)
        got = {(r["u"], r["v"]) for r in got_df.collect()}
        assert got == _py_ktruss(pairs, k), k
        assert rounds >= 1


def test_k_truss_two_cliques_bridge(spark):
    """Two 4-cliques joined by a bridge: 4-truss keeps both cliques,
    drops the bridge."""
    from approximate_pagerank_public_spark.operators.triangles import k_truss
    from approximate_pagerank_public_spark.plans.graph import Graph

    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
    edges = c1 + c2 + [(3, 4)]
    src, dst = zip(*edges)
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=8, num_partitions=2)
    got_df, _ = k_truss(g, k=4)
    got = {(r["u"], r["v"]) for r in got_df.collect()}
    assert got == set(c1) | set(c2)
    g.unpersist()


def test_k_truss_k2_is_all_edges(g5):
    from approximate_pagerank_public_spark.operators.triangles import (
        canonical_edges,
        k_truss,
    )

    got_df, rounds = k_truss(g5, k=2)
    assert rounds == 0
    assert got_df.count() == canonical_edges(g5).count()
