"""Exact discrete quantiles over a bounded-cardinality integer measure.

``approx_percentile`` is the right tool for unbounded continuous
columns, but its sketch is engine-specific — useless for a cross-engine
value-hash contract, and overkill when the measure's DISTINCT value set
is small (document token counts, degree values, per-session event
counts: thousands of distinct values at any corpus size). For those,
EXACT quantiles cost one histogram aggregation plus a cumulative sum
over the histogram:

1. ``groupBy(value).count()`` — map-side combinable, the only pass over
   the data;
2. ascending cumulative count over the DISTINCT-VALUE histogram (the
   global single-partition window runs over O(distinct values) rows,
   never over the data — same pattern as ``graphstats.rich_club``);
3. for each requested percent ``p``, the answer is the value whose
   cumulative range covers rank ``floor((n-1)·p/100)`` (0-indexed,
   "lower" interpolation — the element AT that rank, no averaging, so
   the result is an exact integer, hash-identical cross-engine).

At 100 TB the histogram is the shuffle: |distinct values| rows, not
|rows|. The quantile selection itself is histogram-sized arithmetic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_int_quantiles(
    df: DataFrame,
    col: str,
    percents: Sequence[int] = (50, 90, 95, 99),
) -> DataFrame:
    """``(p, n, rank, value)`` — exact ``p``-th percentile of integer
    column ``col``: ``value`` is the element at 0-indexed rank
    ``((n-1)·p) div 100`` in ascending order. All columns are exact
    BIGINTs; no floats anywhere."""
    spark = df.sparkSession
    hist = (
        df.select(F.col(col).cast("long").alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("c"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("v", "c", F.sum("c").over(w).alias("hi"))
    tot = hist.agg(F.sum("c").alias("n"))
    ps = spark.createDataFrame([(int(p),) for p in percents], "p long")
    joined = cum.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(ps))
    rank = F.expr("((n - 1) * p) div 100")
    return (
        joined.where((rank >= F.col("hi") - F.col("c")) & (rank < F.col("hi")))
        .select(
            "p",
            "n",
            rank.cast("long").alias("rank"),
            F.col("v").alias("value"),
        )
    )


def exact_int_quantiles_by(
    df: DataFrame,
    group_col: str,
    col: str,
    percents: Sequence[int] = (50, 95),
) -> DataFrame:
    """``(group, p, n, rank, value)`` — :func:`exact_int_quantiles` per
    group. The cumulative sum windows BY GROUP (fully parallel across
    groups; within a group it runs over that group's distinct values
    only), totals join back on the group key — the per-group state is
    the group's histogram, never its rows."""
    g = F.col(group_col).alias("g")
    hist = (
        df.select(g, F.col(col).cast("long").alias("v"))
        .groupBy("g", "v")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select("g", "v", "c", F.sum("c").over(w).alias("hi"))
    tot = hist.groupBy("g").agg(F.sum("c").alias("n"))
    spark = df.sparkSession
    ps = spark.createDataFrame([(int(p),) for p in percents], "p long")
    joined = cum.join(tot, "g").crossJoin(F.broadcast(ps))
    rank = F.expr("((n - 1) * p) div 100")
    return (
        joined.where((rank >= F.col("hi") - F.col("c")) & (rank < F.col("hi")))
        .select(
            F.col("g").alias(group_col),
            "p",
            "n",
            rank.cast("long").alias("rank"),
            F.col("v").alias("value"),
        )
    )
