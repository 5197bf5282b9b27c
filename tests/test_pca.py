"""embedding_pca (operators/pca.py) vs a pure-Python replay and the
true covariance eigenvector."""

import math

import numpy as np
import pytest

from approximate_pagerank_public_spark.operators.pca import embedding_pca


def _vectors(n=200, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: one dominant direction + noise
    direction = rng.standard_normal(dim)
    direction /= np.linalg.norm(direction)
    coef = rng.standard_normal(n) * 3.0
    noise = rng.standard_normal((n, dim)) * 0.3
    data = np.outer(coef, direction) + noise + 0.5
    return data.astype(np.float32)


def _python_replay(data, iters, scale=1_000_000):
    n, dim = data.shape
    q = np.floor(data.astype(np.float64) * scale).astype(np.int64)
    G = q.T @ q
    s = q.sum(axis=0, dtype=np.int64)
    C = [
        [
            (float(G[t][u]) / n - (float(s[t]) / n) * (float(s[u]) / n))
            / float(scale * scale)
            for u in range(dim)
        ]
        for t in range(dim)
    ]
    x = [((t + 1) * 2654435761 % 1000003) / 1000003.0 - 0.5 for t in range(dim)]
    for _ in range(iters):
        z = []
        for t in range(dim):
            acc = C[t][0] * x[0]
            for u in range(1, dim):
                acc += C[t][u] * x[u]
            z.append(acc)
        acc = z[0] * z[0]
        for t in range(1, dim):
            acc += z[t] * z[t]
        nrm = math.sqrt(acc) or 1.0
        x = [v / nrm for v in z]
    pc = x
    mean = [(float(s[t]) / n) / float(scale) for t in range(dim)]
    mdot = mean[0] * pc[0]
    for t in range(1, dim):
        mdot += mean[t] * pc[t]
    qd = q.astype(np.float64) / scale
    out = {}
    for i in range(n):
        acc = 0.0
        for t in range(dim):
            acc += qd[i][t] * pc[t]
        out[i] = acc - mdot
    return pc, out


def test_pca_matches_python_replay(spark):
    data = _vectors()
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(data)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["pc1"] for r in embedding_pca(emb, iters=8).collect()}
    _, want = _python_replay(data, iters=8)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-9)


def test_pca_finds_dominant_direction(spark):
    data = _vectors()
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(data)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["pc1"] for r in embedding_pca(emb, iters=20).collect()}
    x = data.astype(np.float64)
    xc = x - x.mean(axis=0)
    vals, vecs = np.linalg.eigh(np.cov(xc.T, bias=True))
    true_pc = vecs[:, -1]
    true_scores = xc @ true_pc
    est = np.array([got[i] for i in range(len(x))])
    cos = abs(
        float(est @ true_scores)
        / (np.linalg.norm(est) * np.linalg.norm(true_scores))
    )
    assert cos > 0.99
