"""SimRank vs a dense NumPy replay of the Jeh-Widom iteration."""

import numpy as np
import pytest

from approximate_pagerank_public_spark.operators.simrank import simrank


@pytest.fixture(scope="module")
def edges(spark):
    # two "citers" 1,2 referencing 3,4; 3,4 both referencing 5;
    # plus an asymmetric tail 5->6, 4->6
    rows = [(1, 3), (2, 3), (1, 4), (2, 4), (3, 5), (4, 5), (5, 6), (4, 6)]
    return spark.createDataFrame(rows, "src long, dst long")


def _numpy_simrank(rows, iters, c):
    verts = sorted({v for r in rows for v in r})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    din = np.zeros(n, dtype=np.int64)
    in_nbrs = [[] for _ in range(n)]
    for s, d in rows:
        din[idx[d]] += 1
        in_nbrs[idx[d]].append(idx[s])
    S = np.eye(n)
    for _ in range(iters):
        N = np.eye(n)
        for a in range(n):
            for b in range(n):
                if a == b or din[a] == 0 or din[b] == 0:
                    continue
                t = sum(S[i, j] for i in in_nbrs[a] for j in in_nbrs[b])
                N[a, b] = (c * t) / float(din[a] * din[b])
        S = N
    return verts, idx, S


def test_simrank_matches_numpy(spark, edges):
    rows = [(r["src"], r["dst"]) for r in edges.collect()]
    iters, c = 3, 0.8
    verts, idx, S = _numpy_simrank(rows, iters, c)
    got = simrank(edges, iters=iters, c=c).collect()
    seen = set()
    for r in got:
        a, b = r["a"], r["b"]
        assert a < b
        seen.add((a, b))
        assert r["s"] == pytest.approx(S[idx[a], idx[b]], abs=1e-12)
    # every nonzero off-diagonal pair is present
    for i, u in enumerate(verts):
        for j, v in enumerate(verts):
            if u < v and S[idx[u], idx[v]] > 0:
                assert (u, v) in seen


def test_simrank_cocited_pair_is_similar(spark, edges):
    # 3 and 4 share both in-neighbors: s1(3,4) = 0.8*2/(2*2) = 0.4
    got = {(r["a"], r["b"]): r["s"] for r in simrank(edges, iters=1).collect()}
    assert got[(3, 4)] == pytest.approx(0.4)
    # 1,2 have no in-edges at all -> never appear
    assert all(a not in (1, 2) and b not in (1, 2) for a, b in got)
