"""Monte-Carlo random-walk PPR: exact golden replay of the md5-derandomized
walk ensemble in pure Python, conservation/determinism invariants, and
estimator agreement with exact PPR on the hub graph."""

import hashlib

import numpy as np

from approximate_pagerank_public_spark.operators.randomwalk import random_walk_ppr


def _draw(seed: str, w: int, t: int) -> int:
    return int(hashlib.md5(f"{seed}:{w}:{t}".encode()).hexdigest()[:15], 16)


def _python_walks(src, dst, source, num_walks, walk_length, pct, seed):
    """Reference replay: dict adjacency with dst-sorted neighbor lists."""
    adj: dict[int, list[int]] = {}
    for s, d in sorted(zip(src.tolist(), dst.tolist())):
        adj.setdefault(s, []).append(d)
    ends: dict[int, int] = {}
    for w in range(num_walks):
        cur, stopped = source, False
        for t in range(walk_length):
            if stopped:
                break
            r = _draw(seed, w, t)
            if r % 100 >= pct:
                stopped = True
                break
            nbrs = adj.get(cur)
            if not nbrs:
                stopped = True
                break
            cur = nbrs[(r // 100) % len(nbrs)]
        ends[cur] = ends.get(cur, 0) + 1
    return ends


def test_mc_ppr_matches_python_golden(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    want = _python_walks(src, dst, 5, 64, 10, 80, "tseed")
    got = (
        random_walk_ppr(g_rand, 5, num_walks=64, walk_length=10, seed="tseed")
        .endpoints()
        .toPandas()
    )
    assert dict(zip(got["id"], got["endpoints"])) == want


def test_mc_ppr_endpoint_conservation_and_determinism(g5):
    r1 = random_walk_ppr(g5, 1, num_walks=128, walk_length=8).endpoints().toPandas()
    r2 = random_walk_ppr(g5, 1, num_walks=128, walk_length=8).endpoints().toPandas()
    assert int(r1["endpoints"].sum()) == 128
    a = r1.sort_values("id").reset_index(drop=True)
    b = r2.sort_values("id").reset_index(drop=True)
    assert a.equals(b)
    assert np.isclose(a["ppr_hat"].sum(), 1.0)


def test_mc_ppr_dangling_source_stays_put(g5):
    # vertex 0 has no out-edges: every walk ends where it started
    got = random_walk_ppr(g5, 0, num_walks=32, walk_length=6).endpoints().toPandas()
    assert got["id"].tolist() == [0]
    assert int(got["endpoints"].iloc[0]) == 32


def test_mc_ppr_estimator_tracks_exact_ppr(g_rand):
    from approximate_pagerank_public_spark.operators.pagerank import (
        personalized_pagerank,
    )

    got = (
        random_walk_ppr(g_rand, 7, num_walks=512, walk_length=16, alpha=0.8)
        .endpoints()
        .toPandas()
    )
    exact = (
        personalized_pagerank(g_rand, 7, alpha=0.8, tol=1e-9, max_iter=100)
        .ranks()
        .toPandas()
    )
    col = next(c for c in exact.columns if c.startswith("rank"))
    # the MC endpoint mode should be among the exact PPR's top-3 mass
    top_mc = int(got.loc[got["endpoints"].idxmax(), "id"])
    top_exact = set(exact.nlargest(3, col)["id"].astype(int))
    assert top_mc in top_exact


def test_random_walk_corpus_replays_hops(g5):
    import hashlib
    from collections import defaultdict

    from approximate_pagerank_public_spark.operators.randomwalk import (
        random_walk_corpus,
    )

    src, dst, _ = g5.edges_numpy()
    adj = defaultdict(list)
    for u, v in zip(src.tolist(), dst.tolist()):
        adj[u].append(v)
    for u in adj:
        adj[u].sort()
    K, L, seed = 2, 5, "rw"
    gold = {}
    for start in range(5):
        for k in range(K):
            walk = start * K + k
            cur = start
            gold[(walk, 0)] = cur
            for t in range(L):
                hv = int(hashlib.md5(f"{seed}:{walk}:{t}".encode()).hexdigest()[:15], 16)
                nbrs = adj.get(cur, [])
                if nbrs:
                    cur = nbrs[hv % len(nbrs)]
                gold[(walk, t + 1)] = cur
    rows = random_walk_corpus(g5, walks_per_vertex=K, walk_length=L, seed=seed).collect()
    got = {(r["walk"], r["step"]): r["vertex"] for r in rows}
    assert got == gold
