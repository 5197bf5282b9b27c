"""Tests for the round-3 training-pipeline operators: recency-decayed
edge weights (operators/temporal.py), bipartite co-occurrence projection
(operators/bipartite.py), neighbor feature mean (operators/features.py),
and skip-gram PMI ratios (operators/randomwalk.py::pmi_scores)."""

import datetime

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.operators.bipartite import cooccurrence
from approximate_pagerank_public_spark.operators.etl import build_edge_table
from approximate_pagerank_public_spark.operators.features import (
    neighbor_mean_features,
)
from approximate_pagerank_public_spark.operators.randomwalk import pmi_scores
from approximate_pagerank_public_spark.operators.temporal import (
    MICROS_PER_DAY,
    build_decayed_edge_table,
)


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols).reset_index(drop=True)


# --------------------------------------------------------------- temporal


def test_decayed_edges_same_structure_as_uniform(spark, transcripts_t1):
    """The decayed edge table covers the IDENTICAL (vertex, edge-pair)
    structure as the uniform-weight ETL — only the weight column
    differs — so decayed ranks live in the same id space."""
    v_u, e_u = build_edge_table(transcripts_t1)
    v_d, e_d, _ = build_decayed_edge_table(transcripts_t1)
    pd.testing.assert_frame_equal(
        _norm(v_u.toPandas()), _norm(v_d.toPandas()), check_dtype=False
    )
    pd.testing.assert_frame_equal(
        _norm(e_u.select("src", "dst").toPandas()),
        _norm(e_d.select("src", "dst").toPandas()),
        check_dtype=False,
    )


def test_decayed_weights_bounds_and_freshest(spark, transcripts_t1):
    """0 < weight ≤ 1/outdeg, and an edge whose last occurrence IS the
    global freshest timestamp gets exactly decay=1 → weight=1/outdeg."""
    _, e_d, _ = build_decayed_edge_table(transcripts_t1)
    _, e_u = build_edge_table(transcripts_t1)
    d = e_d.toPandas().set_index(["src", "dst"])["weight"]
    u = e_u.toPandas().set_index(["src", "dst"])["weight"]
    assert (d > 0).all()
    # decay ∈ (0, 1] ⇒ decayed ≤ uniform everywhere, equality somewhere
    ratio = (d / u.loc[d.index]).to_numpy()
    assert (ratio <= 1.0 + 1e-15).all()
    assert np.isclose(ratio.max(), 1.0)


def test_decayed_golden_two_conversations(spark):
    """Hand-computed golden on two single-edge conversations 3 days
    apart: the stale edge's weight is (1/(1+3))/outdeg."""
    t0 = datetime.datetime(2026, 1, 10, 12, 0, 0)
    rows = []
    # conv A (fresh): user -> assistant at t0
    rows.append(("cA", 0, "user", None, "hi", t0))
    rows.append(("cA", 1, "assistant", None, "yo", t0))
    # conv B (stale): user -> assistant 3 days earlier
    t1 = t0 - datetime.timedelta(days=3)
    rows.append(("cB", 0, "user", None, "old", t1))
    rows.append(("cB", 1, "assistant", None, "old", t1))
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, "
        "text string, ts timestamp_ntz"
    )
    verts, edges, _ = build_decayed_edge_table(tr)
    vmap = dict(verts.toPandas()[["entity", "id"]].itertuples(index=False))
    w = edges.toPandas().set_index(["src", "dst"])["weight"]
    ua = w[(vmap["role:user"], vmap["role:assistant"])]
    # role:user has out-edges to role:assistant, conv:cA, conv:cB → outdeg 3;
    # its freshest user→assistant occurrence is t0 → decay 1
    assert ua == pytest.approx(1.0 / 3.0, abs=0)
    # conv B's role:assistant→conv:cB edge: freshest occurrence is t1,
    # 3 whole days old → decay 1/4; role:assistant outdeg = 2 (cA, cB)
    ab = w[(vmap["role:assistant"], vmap["conv:cB"])]
    assert ab == pytest.approx((1.0 / 4.0) / 2.0, abs=0)
    # sanity: the age bucketing is integer-days on micros
    assert (3 * MICROS_PER_DAY) // MICROS_PER_DAY == 3


def test_decayed_regime_parity(spark, transcripts_t1, monkeypatch):
    """Broadcast-join regime vs beyond-threshold shuffle-join/window
    regime: bit-identical weights (same discipline as the uniform ETL's
    regime-parity invariant)."""
    from approximate_pagerank_public_spark.operators import temporal

    _, e_a, small_a = build_decayed_edge_table(transcripts_t1)
    monkeypatch.setattr(temporal, "ETL_BROADCAST_MAX_VERTICES", 0)
    _, e_b, small_b = build_decayed_edge_table(transcripts_t1)
    assert small_a and not small_b
    pd.testing.assert_frame_equal(
        _norm(e_a.toPandas()), _norm(e_b.toPandas()), check_dtype=False
    )


# -------------------------------------------------------------- bipartite


def _inc(spark, rows):
    return spark.createDataFrame(rows, "part string, item string")


def test_cooccurrence_golden(spark):
    inc = _inc(
        spark,
        [
            ("p1", "a"), ("p1", "b"), ("p1", "c"),
            ("p2", "a"), ("p2", "b"),
            ("p3", "b"), ("p3", "c"),
            ("p4", "a"),  # singleton part → no pairs
        ],
    )
    got = {
        (r.item_a, r.item_b): r.cnt
        for r in cooccurrence(inc, "part", "item").collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 2}


def test_cooccurrence_duplicates_collapse_and_min_count(spark):
    """Duplicate (part, item) rows must not inflate counts; min_count
    filters the tail."""
    inc = _inc(
        spark,
        [("p1", "a"), ("p1", "a"), ("p1", "b"), ("p2", "a"), ("p2", "b"),
         ("p2", "c")],
    )
    got = {
        (r.item_a, r.item_b): r.cnt
        for r in cooccurrence(inc, "part", "item", min_count=2).collect()
    }
    assert got == {("a", "b"): 2}


def test_cooccurrence_cap_truncates_lexicographically(spark):
    """A degenerate part is truncated to its cap lexicographically
    smallest items — deterministic, and pair volume is bounded by
    cap·(cap−1)/2 per part."""
    big = [("hub", f"t{i:02d}") for i in range(10)]
    inc = _inc(spark, big + [("p", "t00"), ("p", "t09")])
    out = cooccurrence(inc, "part", "item", max_items_per_part=3).collect()
    pairs = {(r.item_a, r.item_b): r.cnt for r in out}
    # hub keeps only t00,t01,t02 → 3 pairs; p keeps both of its 2 items
    assert pairs == {
        ("t00", "t01"): 1,
        ("t00", "t02"): 1,
        ("t01", "t02"): 1,
        ("t00", "t09"): 1,
    }
    # uncapped volume: the hub emits all 45 pairs ((t00,t09) merges with
    # p's contribution, cnt 2)
    uncapped = {
        (r.item_a, r.item_b): r.cnt
        for r in cooccurrence(inc, "part", "item").collect()
    }
    assert len(uncapped) == 45 and uncapped[("t00", "t09")] == 2


# --------------------------------------------------------------- features


def test_neighbor_mean_golden(spark):
    """Numpy golden: mean of in-neighbor vectors per (dst, dim); a dst
    whose in-neighbors carry no features is absent."""
    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (0, 3), (9, 4)], "src int, dst int"
    )
    feats = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 6.0])],
        "vec_id int, embedding array<float>",
    )
    got = neighbor_mean_features(edges, feats).toPandas()
    tbl = got.set_index(["id", "dim"])
    # dst 2: mean of v0=[1,2], v1=[3,6]
    assert tbl.loc[(2, 0), "nbr_mean"] == 2.0
    assert tbl.loc[(2, 1), "nbr_mean"] == 4.0
    assert (tbl.loc[(2, 0), "deg"], tbl.loc[(2, 1), "deg"]) == (2, 2)
    # dst 3: only v0
    assert tbl.loc[(3, 0), "nbr_mean"] == 1.0
    assert tbl.loc[(3, 1), "nbr_mean"] == 2.0
    # dst 4's only in-neighbor (9) has no feature row → absent entirely
    assert 4 not in got["id"].to_numpy()


def test_neighbor_mean_long_form_shape(spark, g_rand):
    """Long-form invariants on a real graph: one row per (featured dst,
    dim), deg == number of featured in-neighbors."""
    n_vecs, d = 16, 3
    rng = np.random.default_rng(0)
    feats = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=d)]) for i in range(n_vecs)],
        "vec_id int, embedding array<float>",
    )
    from approximate_pagerank_public_spark.operators.features import (
        neighbor_mean_modulo,
    )

    out = neighbor_mean_modulo(g_rand, feats).toPandas()
    # every vertex has a feature (modulo fold) → deg(dst) == in-degree
    indeg = (
        g_rand.edges.groupBy("dst").agg(F.count("*").alias("k")).toPandas()
    )
    indeg = dict(zip(indeg["dst"], indeg["k"]))
    per_id = out.groupby("id")
    assert set(per_id.size().to_numpy()) == {d}
    for vid, grp in per_id:
        assert set(grp["deg"]) == {indeg[vid]}


# ------------------------------------------------------------------- PMI


def test_pmi_golden(spark):
    """Exact-arithmetic golden: pmi_ratio = n·N / (n(center)·n(context))."""
    pairs = spark.createDataFrame(
        [(0, 1, 4), (0, 2, 1), (1, 2, 5)], "center int, context int, n int"
    )
    got = {
        (r.center, r.context): r.pmi_ratio
        for r in pmi_scores(pairs).collect()
    }
    N = 10.0
    assert got[(0, 1)] == (4.0 * N) / (5.0 * 4.0)
    assert got[(0, 2)] == (1.0 * N) / (5.0 * 6.0)
    assert got[(1, 2)] == (5.0 * N) / (5.0 * 6.0)


def test_butterfly_count_golden(spark):
    from approximate_pagerank_public_spark.operators.bipartite import (
        butterfly_count,
    )

    # p1:{a,b}, p2:{a,b} -> exactly one butterfly; p3:{a,c} adds none
    inc = spark.createDataFrame(
        [("p1", "a"), ("p1", "b"), ("p2", "a"), ("p2", "b"), ("p3", "a"),
         ("p3", "c")],
        "part string, item string",
    )
    assert butterfly_count(inc, "part", "item").first()["butterflies"] == 1
    # complete 3x3 biclique: C(3,2)^2 = 9 butterflies
    full = spark.createDataFrame(
        [(f"p{i}", f"i{j}") for i in range(3) for j in range(3)],
        "part string, item string",
    )
    assert butterfly_count(full, "part", "item").first()["butterflies"] == 9


def test_butterfly_count_random_matches_brute(spark):
    from itertools import combinations

    from approximate_pagerank_public_spark.operators.bipartite import (
        butterfly_count,
    )

    rng = np.random.default_rng(3)
    rows = {(int(p), int(i)) for p, i in zip(
        rng.integers(0, 12, 120), rng.integers(0, 8, 120))}
    items_of = {}
    for p, i in rows:
        items_of.setdefault(p, set()).add(i)
    want = 0
    for p, q in combinations(sorted(items_of), 2):
        c = len(items_of[p] & items_of[q])
        want += c * (c - 1) // 2
    inc = spark.createDataFrame(
        [(p, i) for p, i in sorted(rows)], "part int, item int"
    )
    got = butterfly_count(inc, "part", "item").first()["butterflies"]
    assert got == want, (got, want)


def test_frequent_itemsets_supports_and_closure(spark):
    from approximate_pagerank_public_spark.operators.bipartite import (
        frequent_itemsets,
    )

    # baskets: {a,b,c} x3, {a,b} x1, {c,d} x2
    rows = []
    for p, items in enumerate(
        [
            ("a", "b", "c"),
            ("a", "b", "c"),
            ("a", "b", "c"),
            ("a", "b"),
            ("c", "d"),
            ("c", "d"),
        ]
    ):
        rows += [(f"p{p}", it) for it in items]
    inc = spark.createDataFrame(rows, "part string, item string")
    out = {
        (r["k"], r["itemset"]): r["support"]
        for r in frequent_itemsets(inc, "part", "item", min_support=3).collect()
    }
    assert out[(1, "a")] == 4 and out[(1, "b")] == 4 and out[(1, "c")] == 5
    assert (1, "d") not in out  # support 2 < 3
    assert out[(2, "a|b")] == 4 and out[(2, "a|c")] == 3 and out[(2, "b|c")] == 3
    assert (2, "c|d") not in out
    assert out[(3, "a|b|c")] == 3
    assert len([k for k in out if k[0] == 3]) == 1


def test_frequent_itemsets_cap_truncates_deterministically(spark):
    from approximate_pagerank_public_spark.operators.bipartite import (
        frequent_itemsets,
    )

    # cap=2 keeps the 2 lexicographically smallest items per part:
    # {a,b,z} x3 -> z never enters any basket
    rows = [(f"p{p}", it) for p in range(3) for it in ("a", "b", "z")]
    inc = spark.createDataFrame(rows, "part string, item string")
    out = {
        (r["k"], r["itemset"])
        for r in frequent_itemsets(
            inc, "part", "item", min_support=2, max_items_per_part=2
        ).collect()
    }
    assert (1, "z") not in out and (2, "a|b") in out and len(out) == 3


def test_role_trigrams_counts(spark):
    from approximate_pagerank_public_spark.operators.events import (
        role_trigrams,
    )

    rows = [
        ("c1", 0, "user"),
        ("c1", 1, "assistant"),
        ("c1", 2, "tool"),
        ("c1", 3, "assistant"),
        ("c2", 0, "user"),
        ("c2", 1, "assistant"),
        ("c2", 2, "tool"),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    out = {
        (r["r1"], r["r2"], r["r3"]): r["n"] for r in role_trigrams(t).collect()
    }
    assert out == {
        ("user", "assistant", "tool"): 2,
        ("assistant", "tool", "assistant"): 1,
    }
