"""HITS: broadcast/distributed path parity, golden NumPy replay,
structural sanity on the g5 fixture."""

import numpy as np
import pandas as pd

from approximate_pagerank_public_spark.operators.hits import hits


def _numpy_hits(src, dst, n, iters):
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iters):
        a.fill(0.0)
        np.add.at(a, dst, h[src])
        a /= np.sqrt(np.dot(a, a)) or 1.0
        h.fill(0.0)
        np.add.at(h, src, a[dst])
        h /= np.sqrt(np.dot(h, h)) or 1.0
    return h, a


def _scores(res) -> pd.DataFrame:
    return res.scores().toPandas().sort_values("id").reset_index(drop=True)


def test_hits_broadcast_matches_numpy_golden(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    want_h, want_a = _numpy_hits(src, dst, g_rand.num_vertices, 8)
    got = _scores(hits(g_rand, max_iter=8, mode="broadcast"))
    np.testing.assert_allclose(got["hub"].to_numpy(), want_h, atol=1e-12)
    np.testing.assert_allclose(got["authority"].to_numpy(), want_a, atol=1e-12)


def test_hits_distributed_matches_broadcast(g_rand):
    b = _scores(hits(g_rand, max_iter=4, mode="broadcast"))
    d = _scores(hits(g_rand, max_iter=4, mode="distributed"))
    assert b["id"].tolist() == d["id"].tolist()
    np.testing.assert_allclose(d["hub"], b["hub"], atol=1e-9)
    np.testing.assert_allclose(d["authority"], b["authority"], atol=1e-9)


def test_hits_g5_structure(g5):
    got = _scores(hits(g5, max_iter=16))
    # L2 norms are 1 after the final normalization of each vector
    assert np.isclose(np.dot(got["hub"], got["hub"]), 1.0)
    assert np.isclose(np.dot(got["authority"], got["authority"]), 1.0)
    # vertex 0 is dangling (no out-edges) => hub score exactly 0
    assert got.loc[got["id"] == 0, "hub"].iloc[0] == 0.0
    # vertex 4 has no in-edges => authority exactly 0
    assert got.loc[got["id"] == 4, "authority"].iloc[0] == 0.0
    # g_rand-independent sanity: scores non-negative
    assert (got["hub"] >= 0).all() and (got["authority"] >= 0).all()


def test_hits_hub_vertex_dominates_authority(g_rand):
    # g_rand wires vertices 1..199 -> 0, so 0 is the clear top authority
    got = _scores(hits(g_rand, max_iter=8))
    assert int(got.loc[got["authority"].idxmax(), "id"]) == 0


def test_katz_matches_numpy_golden_and_path_parity(g_rand):
    import numpy as np

    from approximate_pagerank_public_spark.operators.hits import katz_centrality

    src, dst, _ = g_rand.edges_numpy()
    beta, iters, n = 0.05, 8, 300
    x = np.ones(n)
    for _ in range(iters):
        s = np.zeros(n)
        np.add.at(s, dst, x[src])
        x = 1.0 + beta * s
    got_b = (
        katz_centrality(g_rand, beta=beta, max_iter=iters, mode="broadcast")
        .toPandas()
        .set_index("id")["katz"]
    )
    got_d = (
        katz_centrality(g_rand, beta=beta, max_iter=iters, mode="distributed")
        .toPandas()
        .set_index("id")["katz"]
    )
    for v in range(n):
        assert abs(got_b[v] - x[v]) < 1e-12
        assert abs(got_d[v] - x[v]) < 1e-9  # agg order differs, tiny drift


def test_katz_beta_zero_is_all_ones(g5):
    from approximate_pagerank_public_spark.operators.hits import katz_centrality

    out = katz_centrality(g5, beta=0.0, max_iter=3, mode="distributed").collect()
    assert all(r["katz"] == 1.0 for r in out)


def test_eigenvector_matches_numpy_golden_and_path_parity(g_rand):
    from approximate_pagerank_public_spark.operators.hits import (
        eigenvector_centrality,
    )

    src, dst, _ = g_rand.edges_numpy()
    n, iters = g_rand.num_vertices, 8
    x = np.ones(n)
    for _ in range(iters):
        s = np.zeros(n)
        np.add.at(s, dst, x[src])
        s /= np.sqrt(np.dot(s, s)) or 1.0
        x = s
    got_b = (
        eigenvector_centrality(g_rand, max_iter=iters, mode="broadcast")
        .toPandas()
        .set_index("id")["eig"]
    )
    got_d = (
        eigenvector_centrality(g_rand, max_iter=iters, mode="distributed")
        .toPandas()
        .set_index("id")["eig"]
    )
    for v in range(n):
        assert abs(got_b[v] - x[v]) < 1e-12
        assert abs(got_d[v] - x[v]) < 1e-9  # agg order differs, tiny drift


def test_eigenvector_is_hits_authority_chain(g_rand):
    # one iteration of eigenvector == first HITS authority half-step
    from approximate_pagerank_public_spark.operators.hits import (
        eigenvector_centrality,
        hits,
    )

    eig = (
        eigenvector_centrality(g_rand, max_iter=1, mode="broadcast")
        .toPandas()
        .set_index("id")["eig"]
    )
    auth = (
        _scores(hits(g_rand, max_iter=1, mode="broadcast"))
        .set_index("id")["authority"]
    )
    np.testing.assert_allclose(eig.to_numpy(), auth.to_numpy(), atol=1e-12)


def test_salsa_matches_numpy_golden_and_conserves_mass(g_rand):
    from approximate_pagerank_public_spark.operators.hits import salsa

    src, dst, _ = g_rand.edges_numpy()
    n = g_rand.num_vertices
    outdeg = np.zeros(n)
    np.add.at(outdeg, src, 1.0)
    indeg = np.zeros(n)
    np.add.at(indeg, dst, 1.0)
    h = (outdeg > 0).astype(float)
    a = np.zeros(n)
    for _ in range(8):
        a = np.zeros(n)
        np.add.at(a, dst, (h / np.maximum(outdeg, 1))[src])
        h = np.zeros(n)
        np.add.at(h, src, (a / np.maximum(indeg, 1))[dst])
    got = (
        salsa(g_rand, max_iter=8, mode="broadcast")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(got["hub"].to_numpy(), h, atol=1e-12)
    np.testing.assert_allclose(got["authority"].to_numpy(), a, atol=1e-12)
    # stochastic half-steps preserve L1 mass exactly: sum == #hubs
    n_hubs = float((outdeg > 0).sum())
    assert abs(got["authority"].sum() - n_hubs) < 1e-9
    assert abs(got["hub"].sum() - n_hubs) < 1e-9


def test_salsa_broadcast_distributed_parity(g_rand):
    from approximate_pagerank_public_spark.operators.hits import salsa

    b = salsa(g_rand, max_iter=4, mode="broadcast").toPandas().sort_values("id")
    d = (
        salsa(g_rand, max_iter=4, mode="distributed")
        .toPandas()
        .sort_values("id")
    )
    assert b["id"].tolist() == d["id"].tolist()
    np.testing.assert_allclose(d["hub"], b["hub"], atol=1e-9)
    np.testing.assert_allclose(d["authority"], b["authority"], atol=1e-9)


def test_salsa_g5_sides(spark, g5):
    """g5: vertex 0 is dangling (outdeg 0) → hub 0; vertex 4 has no
    in-edges → authority 0."""
    from approximate_pagerank_public_spark.operators.hits import salsa

    got = salsa(g5, max_iter=8, mode="broadcast").toPandas().set_index("id")
    assert got.loc[0, "hub"] == 0.0
    assert got.loc[4, "authority"] == 0.0
    assert (got["hub"] >= 0).all() and (got["authority"] >= 0).all()
