"""Sessionization and as-of join (operators/events.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.operators.events import (
    asof_join,
    session_stats,
    sessionize,
)


def _ts(minute, sec=0, us=0):
    return dt.datetime(2024, 1, 1, 0, minute, sec, us)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: events at 0, 1, 2 min (one session with 60s gap),
        # then 20 min (new session), 21 min
        (0, _ts(0), 1, "view", 1.0),
        (1, _ts(1), 1, "click", 2.0),
        (2, _ts(2), 1, "purchase", 3.0),
        (3, _ts(20), 1, "view", 4.0),
        (4, _ts(21), 1, "purchase", 5.0),
        # user 2: single event
        (5, _ts(5), 2, "view", 6.0),
        # user 3: two events at the SAME timestamp (tie -> id order)
        (6, _ts(7), 3, "click", 7.0),
        (7, _ts(7), 3, "purchase", 8.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_sessionize_gap_boundaries(ev):
    out = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(ev, gap_seconds=120).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 0, 6: 0, 7: 0}


def test_session_stats_integers(ev):
    stats = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_us"])
        for r in session_stats(ev, gap_seconds=120).collect()
    }
    assert stats[(1, 0)] == (3, 120_000_000)
    assert stats[(1, 1)] == (2, 60_000_000)
    assert stats[(2, 0)] == (1, 0)
    assert stats[(3, 0)] == (2, 0)


def test_asof_join_latest_prior_value(ev):
    left = ev.where(F.col("event_type") == "view")
    right = ev.where(F.col("event_type") == "purchase")
    out = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, payload_cols=("value",)).collect()
    }
    # user 1: view@0 has no prior purchase; view@20 sees purchase@2 (3.0)
    assert out[0] is None
    assert out[3] == 3.0
    # user 2 has no purchases at all
    assert out[5] is None


def test_asof_join_equal_ts_tie(ev):
    left = ev.where(F.col("event_type") == "click")
    right = ev.where(F.col("event_type") == "purchase")
    non_strict = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right).collect()
    }
    # user 3: click@7min and purchase@7min share a timestamp — visible
    assert non_strict[6] == 8.0
    strict = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, strict=True).collect()
    }
    assert strict[6] is None


def test_asof_join_multiple_rights_same_ts(spark):
    left = spark.createDataFrame(
        [(10, _ts(9), 1)], "event_id long, ts timestamp, user_id long"
    )
    right = spark.createDataFrame(
        [(1, _ts(9), 1, 100.0), (2, _ts(9), 1, 200.0), (0, _ts(8), 1, 50.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    out = asof_join(left, right).collect()
    # at equal ts the highest right id wins
    assert out[0]["asof_value"] == 200.0


def test_asof_join_matches_naive_sql(spark, sf_dir_smoke="/root/testdata/sf0.001"):
    """Union+window formulation == per-row correlated max (semantics check)."""
    ev = spark.read.parquet(f"{sf_dir_smoke}/events.parquet")
    left = ev.where(F.col("event_type") == "click").limit(200)
    right = ev.where(F.col("event_type") == "purchase")
    got = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right).collect()
    }
    left.createOrReplaceTempView("_aj_left")
    right.createOrReplaceTempView("_aj_right")
    want = {
        r["event_id"]: r["asof_value"]
        for r in left.sparkSession.sql(
            """
            SELECT l.event_id, (
              SELECT r.value FROM _aj_right r
              WHERE r.user_id = l.user_id AND r.ts <= l.ts
              ORDER BY r.ts DESC, r.event_id DESC LIMIT 1
            ) AS asof_value
            FROM _aj_left l
            """
        ).collect()
    }
    assert got == want


# ------------------------------------------------------------ funnel


def test_funnel_full_progression(ev):
    from approximate_pagerank_public_spark.operators.events import funnel

    out = {
        r["user_id"]: r
        for r in funnel(ev, ["view", "click", "purchase"]).collect()
    }
    # user 1: view@0 click@1 purchase@2 — full funnel, first event IS the view
    assert out[1]["steps_completed"] == 3
    assert out[1]["t0_offset_us"] == 0
    assert out[1]["d01_us"] == 60_000_000
    assert out[1]["d12_us"] == 60_000_000
    # user 2: only a view
    assert out[2]["steps_completed"] == 1
    assert out[2]["d01_us"] is None
    # user 3: no view at all -> zero steps, but the user IS in the output
    assert out[3]["steps_completed"] == 0
    assert out[3]["t0_offset_us"] is None


def test_funnel_strictly_after_and_greedy_earliest(spark):
    from approximate_pagerank_public_spark.operators.events import funnel

    rows = [
        # purchase BETWEEN view and click must not count (order matters);
        # the later purchase@2min does
        (0, _ts(0), 1, "view"),
        (1, _ts(0, 30), 1, "purchase"),
        (2, _ts(1), 1, "click"),
        (3, _ts(2), 1, "purchase"),
        # user 2: click at the SAME ts as the view -> strict > rejects it
        (4, _ts(0), 2, "view"),
        (5, _ts(0), 2, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["user_id"]: r for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert out[1]["steps_completed"] == 3
    assert out[1]["d01_us"] == 60_000_000  # click@1 - view@0
    assert out[1]["d12_us"] == 60_000_000  # purchase@2 - click@1
    assert out[2]["steps_completed"] == 1  # same-ts click rejected


def test_event_transitions_counts(ev):
    from approximate_pagerank_public_spark.operators.events import event_transitions

    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in event_transitions(ev).collect()
    }
    # user 1: view,click,purchase,view,purchase; user 3: click@7 -> purchase@7
    # (same-ts tie broken by event_id); user 2 contributes nothing
    assert got == {
        ("view", "click"): 1,
        ("click", "purchase"): 2,
        ("purchase", "view"): 1,
        ("view", "purchase"): 1,
    }


def test_props_numeric_stats(spark):
    from approximate_pagerank_public_spark.operators.events import (
        props_numeric_stats,
    )

    rows = [
        (0, "a", '{"k": 5}'),
        (1, "a", '{"k": 7}'),
        (2, "a", '{"other": 1}'),  # k missing -> not counted in k aggs
        (3, "b", None),            # null props
        (4, "b", '{"k": -2}'),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, props string")
    got = {r["event_type"]: r for r in props_numeric_stats(df).collect()}
    assert (got["a"]["n_events"], got["a"]["n_with_k"]) == (3, 2)
    assert (got["a"]["sum_k"], got["a"]["min_k"], got["a"]["max_k"]) == (12, 5, 7)
    assert (got["b"]["n_events"], got["b"]["n_with_k"], got["b"]["sum_k"]) == (2, 1, -2)


def test_hourly_rollup_tumbling_windows(ev):
    from approximate_pagerank_public_spark.operators.events import hourly_rollup

    # 10-minute windows anchored at the first event (minute 0)
    out = {
        (r["window_idx"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in hourly_rollup(ev, window_us=600_000_000).collect()
    }
    assert out == {
        (0, "view"): (2, 700),       # minutes 0 (1.00) + 5 (6.00)
        (0, "click"): (2, 900),      # minutes 1 (2.00) + 7 (7.00)
        (0, "purchase"): (2, 1100),  # minutes 2 (3.00) + 7 (8.00)
        (2, "view"): (1, 400),       # minute 20
        (2, "purchase"): (1, 500),   # minute 21
    }


def test_turn_latency_gap_aggregates(spark):
    from approximate_pagerank_public_spark.operators.events import turn_latency

    rows = [
        ("A", 0, _ts(0)),
        ("A", 1, _ts(0, 10)),
        ("A", 2, _ts(0, 40)),
        ("B", 0, _ts(1)),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    out = {r["conv_id"]: r for r in turn_latency(df).collect()}
    a = out["A"]
    assert (a["n_turns"], a["total_gap_us"], a["max_gap_us"]) == (
        3,
        40_000_000,
        30_000_000,
    )
    assert a["avg_gap_us"] == 20_000_000.0
    b = out["B"]
    assert (b["n_turns"], b["total_gap_us"], b["max_gap_us"], b["avg_gap_us"]) == (
        1,
        0,
        0,
        0.0,
    )


def test_tool_latency_per_tool_gaps(spark):
    from approximate_pagerank_public_spark.operators.events import tool_latency

    rows = [
        ("A", 0, "user", None, _ts(0)),
        ("A", 1, "tool", "t_search", _ts(0, 5)),    # gap 5 s
        ("A", 2, "assistant", None, _ts(0, 6)),
        ("A", 3, "tool", "t_search", _ts(0, 7)),    # gap 1 s
        ("B", 0, "tool", "t_click", _ts(1)),        # turn 0: no gap, excluded
        ("B", 1, "tool", "t_click", _ts(1, 2)),     # gap 2 s
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, ts timestamp"
    )
    got = {r["tool"]: r for r in tool_latency(df).collect()}
    s = got["t_search"]
    assert (s["n_calls"], s["total_gap_us"], s["max_gap_us"]) == (
        2,
        6_000_000,
        5_000_000,
    )
    assert s["avg_gap_us"] == 3_000_000.0
    c = got["t_click"]
    assert (c["n_calls"], c["total_gap_us"]) == (1, 2_000_000)


def test_sliding_rollup_overlapping_windows(ev):
    from approximate_pagerank_public_spark.operators.events import sliding_rollup

    # 10-min windows sliding by 5 min: event at minute 7 lands in the
    # windows starting at minutes 0 and 5 (idx 0 and 1)
    out = {}
    for r in sliding_rollup(
        ev, window_us=600_000_000, slide_us=300_000_000
    ).collect():
        out.setdefault((r["window_idx"], r["event_type"]), 0)
        out[(r["window_idx"], r["event_type"])] += r["n_events"]
    # fixture minutes: view 0,5,20; click 1,7; purchase 2,7(+21)
    # window 0 covers [0,10): view@0,5 click@1,7 purchase@2,7
    assert out[(0, "view")] == 2 and out[(0, "click")] == 2
    assert out[(0, "purchase")] == 2
    # window 1 covers [5,15): view@5 click@7 purchase@7
    assert out[(1, "view")] == 1 and out[(1, "click")] == 1
    # window 4 covers [20,30): view@20 purchase@21; window 3 [15,25) too
    assert out[(4, "view")] == 1 and out[(4, "purchase")] == 1
    assert out[(3, "view")] == 1 and out[(3, "purchase")] == 1


def test_rate_anomaly_matches_numpy(spark, ev):
    import numpy as np

    from approximate_pagerank_public_spark.operators.events import rate_anomaly

    got = rate_anomaly(ev).toPandas()
    pdf = ev.toPandas()
    t0 = pdf["ts"].min()
    pdf["widx"] = ((pdf["ts"] - t0).dt.total_seconds() * 1e6 // 3_600_000_000).astype(int)
    counts = pdf.groupby(["event_type", "widx"]).size()
    for (etype, widx), c in counts.items():
        cs = counts[etype].to_numpy(dtype=np.int64)
        nw, s1, s2 = len(cs), cs.sum(), (cs * cs).sum()
        rad = nw * s2 - s1 * s1
        want = 0.0 if rad == 0 else (nw * c - s1) / np.sqrt(float(rad))
        row = got[(got["event_type"] == etype) & (got["window_idx"] == widx)]
        assert len(row) == 1
        assert row["n_events"].iloc[0] == c
        assert row["z"].iloc[0] == want  # bit parity: int ops + one sqrt + one div


def test_rate_anomaly_zero_variance_is_zero(spark, ev):
    from approximate_pagerank_public_spark.operators.events import rate_anomaly

    # user 2's "view" at minute 5 and user 1's at minute 0/20 share hours?
    # construct directly: a type with identical counts in every window
    rows = [(i, _ts(0) + dt.timedelta(hours=h), 1, "flat", 1.0) for h, i in
            [(0, 0), (1, 1), (2, 2)]]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = rate_anomaly(df).toPandas()
    assert (got["z"] == 0.0).all()
    assert (got["n_events"] == 1).all()
