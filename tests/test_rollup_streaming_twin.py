"""The rollup operators' "batch twin of a Structured Streaming window
aggregate" claim, proven against the real thing: a readStream +
F.window groupBy over the same rows must produce the same counts once
window starts are translated to origin-relative indices (the fixture's
origin is hour-aligned so the anchoring coincides)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

# hour-aligned origin => F.window boundaries coincide with the
# rollups' origin-anchored windows
_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mins(m):
    return _T0 + dt.timedelta(minutes=m)


@pytest.fixture(scope="module")
def ev_rows(spark):
    rows = [
        (0, _mins(0), "view", 1.0),
        (1, _mins(7), "click", 2.0),
        (2, _mins(59), "view", 3.0),
        (3, _mins(61), "view", 4.0),
        (4, _mins(75), "purchase", 5.0),
        (5, _mins(130), "click", 6.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).cache()


def _stream_windowed(spark, ev, tmp, name, slide=None):
    src = str(tmp / f"in_{name}")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    win = (
        F.window("ts", "1 hour", slide) if slide else F.window("ts", "1 hour")
    )
    agg = stream.groupBy(win.alias("w"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(f"SELECT * FROM {name}").collect()
    idx = lambda r: int((r["w"]["start"] - _T0).total_seconds() // 60)
    return {
        (idx(r), r["event_type"]): (r["n_events"], r["value_cents"])
        for r in out
    }


def test_hourly_rollup_matches_streaming_window(spark, ev_rows, tmp_path_factory):
    from approximate_pagerank_public_spark.operators.events import hourly_rollup

    tmp = tmp_path_factory.mktemp("rolltwin")
    streamed = _stream_windowed(spark, ev_rows, tmp, "tumbling")
    batch = {
        (r["window_idx"] * 60, r["event_type"]): (r["n_events"], r["value_cents"])
        for r in hourly_rollup(ev_rows).collect()
    }
    assert batch == streamed


def test_sliding_rollup_matches_streaming_window(spark, ev_rows, tmp_path_factory):
    from approximate_pagerank_public_spark.operators.events import sliding_rollup

    tmp = tmp_path_factory.mktemp("rolltwin2")
    streamed = _stream_windowed(
        spark, ev_rows, tmp, "hopping", slide="15 minutes"
    )
    # F.window also emits windows STARTING BEFORE the stream origin
    # (negative start minutes); sliding_rollup indexes only windows
    # anchored at/after the origin — compare that shared domain
    streamed_nonneg = {
        (m, t): v for (m, t), v in streamed.items() if m >= 0
    }
    batch = {
        (r["window_idx"] * 15, r["event_type"]): r["n_events"]
        for r in sliding_rollup(ev_rows).collect()
    }
    assert batch == {k: n for k, (n, _c) in streamed_nonneg.items()}
