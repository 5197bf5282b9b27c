"""Watermarked windowed rollup: append-mode finalization + late drop.

Spark uses TWO watermarks per micro-batch (SPARK-40925): late-event
FILTERING uses the previous batch's watermark, EVICTION/emission uses
the current one — so a row only gets dropped once the watermark that
covers it was established two batches back. The fixture therefore
feeds three files.
"""

import datetime as dt
import glob
import os
import time

from approximate_pagerank_public_spark.streaming.rollup_stream import (
    watermarked_hourly_rollup,
)

_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _t(h, m):
    return dt.datetime(2024, 1, 1, h, m, 0)


def test_watermark_finalizes_windows_and_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "in")
    # b1: two rows in hour 0, one in hour 2 (max event time 2:50)
    b1 = spark.createDataFrame(
        [
            (0, _t(0, 10), 1, "view", 1.0),
            (1, _t(0, 20), 1, "view", 2.0),
            (2, _t(2, 50), 1, "view", 4.0),
        ],
        _SCHEMA,
    )
    # b2: one row in hour 3 — during this batch the eviction watermark
    # is 1:50 (2:50 - 1h), so hour 0 finalizes WITHOUT the late row;
    # max event time advances to 3:40
    b2 = spark.createDataFrame([(3, _t(3, 40), 1, "view", 16.0)], _SCHEMA)
    # b3: a LATE hour-0 row — the late-event watermark is now 2:40
    # (3:40 - 1h), so 0:30 is dropped; plus an hour-4 row that advances
    # the watermark so hour 2 finalizes in the trailing no-data batch.
    # Hours 3 and 4 stay open and must never be emitted in append mode.
    b3 = spark.createDataFrame(
        [
            (4, _t(0, 30), 1, "view", 100.0),
            (5, _t(4, 30), 1, "view", 8.0),
        ],
        _SCHEMA,
    )
    now = time.time()
    seen = set()
    for i, b in enumerate((b1, b2, b3)):
        b.coalesce(1).write.mode("append" if i else "overwrite").parquet(src)
        fresh = set(glob.glob(f"{src}/*.parquet")) - seen
        for f in fresh:
            os.utime(f, (now - 100 * (3 - i), now - 100 * (3 - i)))
        seen |= fresh

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = watermarked_hourly_rollup(stream, watermark="1 hour")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("wmrollup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    rows = {
        r["window_start"].hour: (r["n_events"], r["value_cents"])
        for r in spark.sql("SELECT * FROM wmrollup").collect()
    }
    # the late 100.0 (10000-cent) row was dropped by the watermark...
    assert dropped == 1
    # ...so hour 0 finalized with ONLY the two on-time rows
    assert rows[0] == (2, 300)
    # hour 2 finalized once the watermark passed its end
    assert rows[2] == (1, 400)
    # hours 3 and 4 are still open at end of input: append mode must
    # not emit them (bounded state = only the watermark horizon)
    assert 3 not in rows and 4 not in rows
