"""Deflated power iteration for the normalized-adjacency second
eigenvector (operators/spectral.py) vs a NumPy replay."""

import numpy as np
import pytest

from approximate_pagerank_public_spark.operators.spectral import (
    normalized_fiedler,
)


def _two_cliques():
    # two 4-cliques bridged by a single edge: the classic spectral
    # bisection fixture — the second eigenvector separates the cliques
    a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    b = [(i + 4, j + 4) for i in range(4) for j in range(i + 1, 4)]
    return a + b + [(3, 4)]


def _numpy_replay(rows, iters):
    verts = sorted({v for r in rows for v in r})
    idx = {v: k for k, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for s, d in rows:
        A[idx[s], idx[d]] = A[idx[d], idx[s]] = 1.0
    deg = A.sum(axis=1)
    u = np.sqrt(deg)
    m2 = deg.sum()
    x = np.array(
        [((v * 2654435761) % 1000003) / 1000003.0 - 0.5 for v in verts]
    )
    P = A / np.outer(u, u)
    for _ in range(iters):
        proj = (u * x).sum() / m2
        y = x - proj * u
        z = P @ y
        nn = np.sqrt((z * z).sum()) or 1.0
        x = z / nn
    return verts, idx, x


def test_fiedler_matches_numpy_replay(spark):
    rows = _two_cliques()
    edges = spark.createDataFrame(rows, "src long, dst long")
    iters = 8
    got = {r["id"]: r["f"] for r in normalized_fiedler(edges, iters).collect()}
    verts, idx, x = _numpy_replay(rows, iters)
    assert set(got) == set(verts)
    for v in verts:
        assert got[v] == pytest.approx(x[idx[v]], abs=1e-9)


def test_fiedler_bisects_two_cliques(spark):
    edges = spark.createDataFrame(_two_cliques(), "src long, dst long")
    got = {r["id"]: r["f"] for r in normalized_fiedler(edges, 12).collect()}
    left = {got[v] for v in range(4)}
    right = {got[v] for v in range(4, 8)}
    # unit norm and clean sign separation between the cliques
    assert sum(f * f for f in got.values()) == pytest.approx(1.0)
    assert (all(f > 0 for f in left) and all(f < 0 for f in right)) or (
        all(f < 0 for f in left) and all(f > 0 for f in right)
    )
