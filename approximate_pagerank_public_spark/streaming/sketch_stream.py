"""Ingest-time cardinality maintenance: a streaming HyperLogLog whose
registers live in Structured Streaming state.

The batch sketch (``functions/sketch.py::approx_distinct_hll``) scans
the whole corpus; at ingest a 100-TB pipeline wants the running
"distinct texts per role so far" updated per micro-batch without
rescanning. HLL registers merge by max, i.e. they are a monotone CRDT —
the ideal streaming state: per (group, register) the state is ONE small
int, updates are idempotent and commutative, so at-least-once replay
can never corrupt the estimate.

Keyed by ``(group, register)`` — 256 keys per group at most — each
micro-batch computes its map-side register maxes (the SAME md5
derivation as the batch sketch, JVM-side) and the stateful function
folds them into the stored register. The emitted rows are the updated
registers; ``estimate_from_registers`` turns any snapshot of them into
the batch-identical estimate, so after the last micro-batch the
cumulative registers EQUAL the batch sketch's register-for-register
(parity-tested in ``tests/test_sketch_stream.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.functions.sketch import (
    ALPHA_M2,
    M,
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
