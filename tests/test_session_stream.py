"""Streaming sessionizer parity: cumulative assignment over ordered
micro-batches equals the batch sessionize exactly, including sessions
that span the micro-batch boundary."""

import datetime as dt

from pyspark.sql import functions as F

from approximate_pagerank_public_spark.operators.events import sessionize
from approximate_pagerank_public_spark.streaming.session_stream import (
    stateful_sessionize,
)

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark):
    rows = []
    eid = 0
    for u in (7, 8):
        for s in range(3):  # 3 sessions per user
            base = s * 40_000 + u  # gaps >> 4h between sessions
            for j in range(4):
                rows.append((eid, _T0 + dt.timedelta(seconds=base + j * 60), u))
                eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    ).cache()


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    import glob
    import os
    import time

    ev = _ev(spark)
    src = str(tmp_path / "in")
    # split mid-session: events 0..4 (session 0 of user 7 + 1 event of
    # session 1) in batch 1, the rest in batch 2. The file source orders
    # batches by file modification time — pin mtimes so batch 1's file
    # is strictly older (a same-second double-write can flip the order).
    ev.where(F.col("event_id") < 5).orderBy("event_id").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    first = set(glob.glob(f"{src}/*.parquet"))
    now = time.time()
    for f in first:
        os.utime(f, (now - 100, now - 100))
    ev.where(F.col("event_id") >= 5).orderBy("event_id").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    for f in set(glob.glob(f"{src}/*.parquet")) - first:
        os.utime(f, (now, now))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_sessionize(stream, gap_seconds=14400)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessstream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["event_id"]): (r["user_id"], r["session_seq"])
        for r in spark.sql("SELECT * FROM sessstream").collect()
    }
    want = {
        r["event_id"]: (r["user_id"], r["session_seq"])
        for r in sessionize(ev, gap_seconds=14400).select(
            "event_id", "user_id", "session_seq"
        ).collect()
    }
    assert got == want
    # sanity: 3 sessions per user were actually produced
    assert max(s for _u, s in got.values()) == 2
