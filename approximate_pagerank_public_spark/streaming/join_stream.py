"""Watermarked stream-stream interval join — the ingest-time twin of
``operators/events.py::interval_join``.

Structured Streaming's canonical two-stream pattern (click→purchase
attribution, request→response matching): both sides ``readStream`` with
event-time watermarks; the join carries the SAME equi-key + time-band
predicate as the batch operator, so once both watermarks pass the data
the emitted pair set equals the batch output exactly (parity-tested in
``tests/test_interval_join.py``).

Why the watermark matters at 100 TB: an unbounded interval join would
retain every left row forever waiting for late rights. The watermark
bounds the state the engine keeps to ``max_gap + watermark_delay`` of
event time per side — Spark drops older state automatically — which is
the streaming expression of the batch plan's "fan-out bounded by events
inside the window" property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_gap_us: int = 1,
    max_gap_us: int = 3_600_000_000,
    watermark: str = "1 hour",
) -> DataFrame:
    """``(left_id, right_id, gap_us)`` append-mode stream. Both inputs
    must be streaming DataFrames with event-time ``ts_col``."""
    lt = left_stream.select(
        F.col(key_col).alias("_l_key"),
        F.col(ts_col).alias("_l_ts"),
        F.col(id_col).alias("left_id"),
    ).withWatermark("_l_ts", watermark)
    rt = right_stream.select(
        F.col(key_col).alias("_r_key"),
        F.col(ts_col).alias("_r_ts"),
        F.col(id_col).alias("right_id"),
    ).withWatermark("_r_ts", watermark)
    # timestampdiff also accepts TIMESTAMP_NTZ (unix_micros does not)
    gap = F.expr("timestampdiff(MICROSECOND, _l_ts, _r_ts)")
    # the time-band join condition doubles as the state-cleanup bound:
    # Spark derives each side's retention from it plus the watermark
    cond = (
        (F.col("_l_key") == F.col("_r_key"))
        & (gap >= F.lit(min_gap_us))
        & (gap <= F.lit(max_gap_us))
    )
    return lt.join(rt, cond).select(
        "left_id", "right_id", gap.alias("gap_us")
    )
