"""Forward-push approximate PPR (operators/push.py): ACL sandwich
invariant, mass conservation, eps→0 exactness, path parity."""

import numpy as np
import pandas as pd

from approximate_pagerank_public_spark.operators.push import approx_ppr_push


def _exact_ppr_dangling_to_source(src, dst, w, n, source, alpha, iters=500):
    """Exact PPR of the chain forward push approximates: dangling mass
    returns to the SOURCE (not redistributed uniformly)."""
    dang = np.ones(n, dtype=bool)
    dang[src] = False
    pr = np.zeros(n)
    pr[source] = 1.0
    e_s = np.zeros(n)
    e_s[source] = 1.0
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, w * pr[src])
        pr = alpha * (contrib + e_s * pr[dang].sum()) + (1.0 - alpha) * e_s
    return pr


def _state(res) -> pd.DataFrame:
    return res.state().toPandas().sort_values("id").reset_index(drop=True)


def test_push_conservation_and_acl_sandwich(g_rand):
    src, dst, w = g_rand.edges_numpy()
    n = g_rand.num_vertices
    res = approx_ppr_push(g_rand, 1, alpha=0.8, eps=1e-4, mode="broadcast")
    st = _state(res)
    p, r = st["p"].to_numpy(), st["r"].to_numpy()
    assert res.converged
    # exact mass conservation: dangling pushes return to the source
    assert abs(p.sum() + r.sum() - 1.0) < 1e-12
    # termination condition: every residual at or below its threshold
    outdeg = np.zeros(n, dtype=np.int64)
    np.add.at(outdeg, src, 1)
    assert (r <= 1e-4 * np.maximum(outdeg, 1) + 1e-15).all()
    # ACL sandwich: 0 <= exact - p <= sum(r) elementwise
    exact = _exact_ppr_dangling_to_source(src, dst, w, n, 1, 0.8)
    gap = exact - p
    assert (gap >= -1e-12).all()
    assert (gap <= r.sum() + 1e-12).all()


def test_push_eps_small_recovers_exact(g5):
    src, dst, w = g5.edges_numpy()
    res = approx_ppr_push(g5, 1, alpha=0.8, eps=1e-9, max_rounds=400,
                          mode="broadcast")
    st = _state(res)
    exact = _exact_ppr_dangling_to_source(src, dst, w, 5, 1, 0.8)
    assert res.converged
    np.testing.assert_allclose(st["p"].to_numpy(), exact, atol=1e-6)


def test_push_broadcast_distributed_parity(g_rand):
    b = approx_ppr_push(g_rand, 1, alpha=0.8, eps=1e-4, mode="broadcast")
    d = approx_ppr_push(g_rand, 1, alpha=0.8, eps=1e-4, mode="distributed")
    assert b.rounds == d.rounds
    assert b.converged and d.converged
    sb, sd = _state(b), _state(d)
    assert sb["id"].tolist() == sd["id"].tolist()
    np.testing.assert_allclose(sd["p"], sb["p"], atol=1e-9)
    np.testing.assert_allclose(sd["r"], sb["r"], atol=1e-9)


def test_push_source_no_outedges_keeps_all_mass(spark):
    # source is dangling: every push returns its residual take to the
    # source, so p(source) -> 1 geometrically and everything else is 0
    from approximate_pagerank_public_spark.plans.graph import Graph

    g = Graph.from_edge_arrays(spark, [0], [1], num_vertices=3, num_partitions=2)
    res = approx_ppr_push(g, 2, alpha=0.8, eps=1e-6, mode="broadcast")
    st = _state(res)
    assert res.converged
    assert st.loc[st["id"] == 2, "p"].iloc[0] > 0.999
    assert st.loc[st["id"] != 2, "p"].abs().max() == 0.0
