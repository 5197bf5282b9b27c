"""Batch interval join golden + parity with the watermarked
stream-stream interval join run through real readStream micro-batches."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.operators.events import interval_join
from approximate_pagerank_public_spark.streaming.join_stream import (
    stream_interval_join,
)

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec):
    return _T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def clicks_purchases(spark):
    clicks = spark.createDataFrame(
        [
            (1, _ts(0), 7),
            (2, _ts(10), 7),
            (3, _ts(0), 8),
            (4, _ts(5000), 7),
        ],
        "event_id long, ts timestamp, user_id long",
    ).cache()
    purchases = spark.createDataFrame(
        [
            (11, _ts(5), 7),     # pairs with click 1 (gap 5 s)
            (12, _ts(3610), 7),  # > 1 h after click 1; 3600 s after 2 (edge)
            (13, _ts(2), 9),     # no click for user 9
            (14, _ts(0), 8),     # gap 0 from click 3 -> excluded (min 1 µs)
        ],
        "event_id long, ts timestamp, user_id long",
    ).cache()
    return clicks, purchases


def test_interval_join_golden(clicks_purchases):
    clicks, purchases = clicks_purchases
    got = {
        (r["left_id"], r["right_id"], r["gap_us"])
        for r in interval_join(clicks, purchases).collect()
    }
    # expected pairs from first principles: gap in [1, 3_600_000_000] µs
    want = set()
    cl = [(1, 0, 7), (2, 10, 7), (3, 0, 8), (4, 5000, 7)]
    pu = [(11, 5, 7), (12, 3610, 7), (13, 2, 9), (14, 0, 8)]
    for lid, lt, lu in cl:
        for rid, rt, ru in pu:
            gap = (rt - lt) * 1_000_000
            if lu == ru and 1 <= gap <= 3_600_000_000:
                want.add((lid, rid, gap))
    assert got == want
    # sanity: the boundary cases behaved as intended
    assert (2, 12, 3_600_000_000) in got  # exactly 1 h -> included
    assert all(p[:2] != (1, 12) for p in got)  # 3610 s > 1 h -> excluded
    assert all(p[:2] != (3, 14) for p in got)  # gap 0 -> excluded


def test_stream_interval_join_matches_batch(spark, clicks_purchases, tmp_path):
    clicks, purchases = clicks_purchases
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    # two micro-batch files per side so the join crosses batches
    c1 = clicks.where(F.col("event_id") <= 2)
    c2 = clicks.where(F.col("event_id") > 2)
    c1.write.mode("overwrite").parquet(cdir)
    c2.write.mode("append").parquet(cdir)
    purchases.write.mode("overwrite").parquet(pdir)

    ls = spark.readStream.schema(clicks.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(cdir)
    rs = spark.readStream.schema(purchases.schema).parquet(pdir)
    out = stream_interval_join(ls, rs)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sij")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["left_id"], r["right_id"], r["gap_us"])
        for r in spark.sql("SELECT * FROM sij").collect()
    }
    want = {
        (r["left_id"], r["right_id"], r["gap_us"])
        for r in interval_join(clicks, purchases).collect()
    }
    assert got == want
