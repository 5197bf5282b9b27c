"""Ingest-time gap-based sessionization — the stateful streaming twin
of ``operators/events.py::sessionize``.

Per-key state is TWO values: the last event time seen and the running
session ordinal. Each arriving event (micro-batches processed per key
in (ts, event_id) order — the same total order the batch operator
uses) either continues the current session or, when the gap exceeds
``gap_seconds``, starts ``session_seq + 1``. When events arrive in
event-time order across micro-batches (the replayable-ingest setting),
the cumulative assignment EQUALS the batch ``sessionize`` output
exactly — parity-tested through real micro-batches in
``tests/test_session_stream.py``.

Scale shape: one shuffle on the key per micro-batch (what any
sessionizer pays), state = 2 small values per ACTIVE key; out-of-order
arrival within a micro-batch is handled by the in-group sort, and
cross-batch disorder surfaces as the same session-split any
at-least-once gap sessionizer exhibits (documented trade — a watermark
+ event-time timeout bounds the active-key state in production)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = "event_id long, user_id long, session_seq long"
_STATE_SCHEMA = "last_us long, seq long"


def stateful_sessionize(
    events_stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 14400,
) -> DataFrame:
    """``(event_id, user_id, session_seq)`` per arriving event."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000

    keyed = events_stream.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col(id_col).cast("long").alias("event_id"),
        F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP '1970-01-01', {ts_col})"
        ).alias("ts_us"),
    )

    def assign(key, pdf_iter, state):
        import pandas as pd

        user_id = key[0]
        chunks = list(pdf_iter)
        pdf = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if not len(pdf):
            return
        pdf = pdf.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        if state.exists:
            last_us, seq = (int(x) for x in state.get)
        else:
            last_us, seq = None, -1
        seqs = []
        for ts_us in pdf["ts_us"]:
            if last_us is None or ts_us - last_us > gap_us:
                seq += 1
            last_us = int(ts_us)
            seqs.append(seq)
        state.update((last_us, seq))
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": user_id,
                "session_seq": seqs,
            }
        )

    return keyed.groupBy("user_id").applyInPandasWithState(
        assign,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
