"""Ingest-time sketch maintenance: a streaming HyperLogLog and a
streaming count-min sketch whose registers live in Structured
Streaming state.

The batch sketches (``functions/sketch.py``) scan the whole corpus; at
ingest a 100-TB pipeline wants the running "distinct texts per role so
far" / "token frequency table so far" updated per micro-batch without
rescanning. Both sketches are ideal streaming state:

- HLL registers merge by max — a monotone CRDT: per (group, register)
  the state is ONE small int, updates are idempotent and commutative,
  so at-least-once replay can never corrupt the estimate.
- Count-min cells merge by + — per (d, w) the state is ONE long and
  each micro-batch contributes its map-side partial count (the shuffle
  per batch is bounded by depth × width cells, never by row count);
  the state-store commit is transactional with the micro-batch, so the
  running counts are exactly-once under restart (restart-tested for
  the same state machinery in ``tests/test_stream.py``).

Keyed by ``(group, register)`` / ``(d, w)`` — at most 256 keys per
group / depth·width keys total — each micro-batch computes its
map-side partials (the SAME md5 derivation as the batch sketches,
JVM-side) and the stateful function folds them into the stored cell.
The emitted rows are the updated cells; ``estimate_from_registers`` /
``functions/sketch.py::count_min_estimate`` turn any snapshot into the
batch-identical answer, so after the last micro-batch the cumulative
state EQUALS the batch sketch cell-for-cell (parity-tested in
``tests/test_sketch_stream.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.functions.sketch import (
    ALPHA_M2,
    M,
    _cms_hash,
    hll_register_cols,
)

_OUT_SCHEMA = "group string, register int, mr int"
_STATE_SCHEMA = "mr int"


def stateful_hll(
    stream: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """``(group, register, mr)`` per micro-batch — the running register
    maxes. State per key: one int."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    reg, rho = hll_register_cols(value_col)
    keyed = stream.select(
        F.col(group_col).cast("string").alias("group"),
        reg.cast("int"),
        rho.cast("int"),
    )
    return keyed.groupBy("group", "register").applyInPandasWithState(
        _hll_group,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def _hll_group(key, pdf_iter, state):
    import pandas as pd

    group, register = key
    mr = int(state.get[0]) if state.exists else 0
    for pdf in pdf_iter:
        if len(pdf):
            mr = max(mr, int(pdf["rho"].max()))
    state.update((mr,))
    yield pd.DataFrame(
        {"group": [group], "register": [register], "mr": [mr]}
    )


_CMS_OUT_SCHEMA = "d int, w int, cnt long"
_CMS_STATE_SCHEMA = "cnt long"


def stateful_cms(
    stream: DataFrame, value_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """``(d, w, cnt)`` per micro-batch — the running count-min cells,
    additive across batches. State per key: one long. A snapshot after
    all data equals ``count_min_build`` on the batch cell-for-cell
    (counts only grow, so reduce a memory-sink snapshot by max)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    rows = stream.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_hash(value_col, d, width).alias("w"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("dw")
    ).select("dw.d", "dw.w")
    return rows.groupBy("d", "w").applyInPandasWithState(
        _cms_group,
        _CMS_OUT_SCHEMA,
        _CMS_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def _cms_group(key, pdf_iter, state):
    import pandas as pd

    d, w = key
    cnt = int(state.get[0]) if state.exists else 0
    for pdf in pdf_iter:
        cnt += len(pdf)
    state.update((cnt,))
    yield pd.DataFrame({"d": [d], "w": [w], "cnt": [cnt]})


def estimate_from_registers(registers: DataFrame) -> DataFrame:
    """``(group, approx_distinct)`` from a register snapshot — the
    identical corrected-free raw estimator as the batch sketch (same
    single division), so a snapshot taken after all data equals
    ``approx_distinct_hll`` bit-for-bit."""
    term = F.expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), mr) AS DOUBLE)")
    per_group = registers.groupBy("group").agg(
        F.sum(term).alias("s_present"), F.count("*").alias("n_present")
    )
    s = F.col("s_present") + (F.lit(M) - F.col("n_present")).cast("double")
    return per_group.select(
        "group", (F.lit(float(ALPHA_M2)) / s).alias("approx_distinct")
    )
