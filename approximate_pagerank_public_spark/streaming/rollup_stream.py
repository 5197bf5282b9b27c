"""Watermarked tumbling-window rollup — late data handled by contract.

The batch twin (``operators/events.py::hourly_rollup``) keys windows by
an exact integer difference from the stream origin; this streaming form
is the production ingest shape: event-time tumbling windows with a
WATERMARK, run in APPEND output mode so a window row is emitted exactly
once — when the watermark passes its end and the result is final.

Late-data semantics (what the watermark buys, and what it costs):

- a row arriving while its window is still open (event time ≥ current
  watermark) is aggregated normally, however out-of-order it is;
- a row arriving LATER than the watermark is DROPPED — the price of
  bounded state: the engine has already finalized (or is free to
  finalize) that window and keeps no state to revise it;
- state per key is one aggregation buffer per open window — the
  watermark is what lets Structured Streaming evict closed windows, so
  memory is ∝ (windows inside the watermark horizon) × (types), never
  stream length.

At 100 TB/day the same plan holds: the pre-shuffle partial aggregation
collapses each micro-batch map-side (counts/sums, no row buffering),
and the state store only ever holds the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermarked_hourly_rollup(
    events_stream: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    watermark: str = "1 hour",
    window: str = "1 hour",
) -> DataFrame:
    """``(window_start, event_type, n_events, value_cents)`` per
    finalized tumbling window. Money in integer cents (the fixture
    contract of the batch twin). Run with ``outputMode("append")``."""
    s = events_stream.withWatermark(ts_col, watermark)
    return (
        s.groupBy(
            F.window(ts_col, window).alias("w"),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )
