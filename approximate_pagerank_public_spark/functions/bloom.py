"""Deterministic Bloom filter (Bloom 1970) — the membership sketch a
100-TB pipeline uses for semi-join pruning and fast decontamination
pre-filters (probe before the exact shingle join ever shuffles).

Same oracle-replayable construction family as ``functions/sketch.py``:
bit ``i`` of a value is the 60-bit md5 of ``"{i}:{value}"`` mod ``m``
(the CMS hash recipe verbatim), so DuckDB replays the filter
bit-for-bit. The filter is represented as the RELATION of set bit
positions (≤ m rows regardless of input size) — map-side combinable to
build (one distinct), trivially shard-mergeable (union ∪ distinct),
and probing is a k-row-per-query join counted to k.

Guarantees: NO false negatives ever (tested); false-positive rate
≈ (1 − e^{−kn/m})^k — callers size ``m`` per expected n. Probe output
carries the exact membership side-by-side so the contract hash checks
both the sketch bits and the FPR behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_BITS = 8192
K_HASHES = 4


def _bit(value_col: str, i: int, m: int):
    payload = F.concat_ws(":", F.lit(str(i)), F.col(value_col).cast("string"))
    h = F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(int(m)))


def bloom_build(
    df: DataFrame, value_col: str, m: int = M_BITS, k: int = K_HASHES
) -> DataFrame:
    """``(bit)`` — the filter's set bit positions. One explode to k rows
    per value + one distinct (map-side partial); merging shards is
    ``unionAll(...).distinct()``."""
    return (
        df.select(
            F.explode(
                F.array(*[_bit(value_col, i, m) for i in range(k)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    queries: DataFrame,
    value_col: str,
    m: int = M_BITS,
    k: int = K_HASHES,
) -> DataFrame:
    """``(value, bloom_hit)`` per distinct query value — hit ⇔ all k
    probe bits set. k rows per query into a join against the ≤m-row
    bit relation (broadcastable at any corpus size)."""
    q = queries.select(F.col(value_col).alias("value")).distinct()
    probes = q.select(
        "value",
        F.explode(F.array(*[_bit("value", i, m) for i in range(k)])).alias(
            "bit"
        ),
    )
    hits = (
        probes.join(F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left")
        .groupBy("value")
        .agg((F.count("_set") == F.lit(k)).alias("bloom_hit"))
    )
    return hits


def bloom_oracle_sql(
    build_rel: str,
    build_expr: str,
    probe_rel: str,
    probe_expr: str,
    m: int = M_BITS,
    k: int = K_HASHES,
) -> str:
    """DuckDB replay: identical bit derivation, identical all-k-hit
    test. ``build_rel``/``probe_rel`` are relations; the exprs yield the
    hashed value (cast to VARCHAR by the caller if needed)."""
    bit = (
        "CAST('0x' || substr(md5(CAST({i} AS VARCHAR) || ':' || {v}), 1, 15) "
        f"AS BIGINT) % {m}"
    )
    build_rows = " UNION ALL ".join(
        f"SELECT {bit.format(i=i, v=build_expr)} AS bit FROM {build_rel}"
        for i in range(k)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT value, {bit.format(i=i, v='CAST(value AS VARCHAR)')} AS bit "
        "FROM q"
        for i in range(k)
    )
    return (
        f"WITH bits AS (SELECT DISTINCT bit FROM ({build_rows})), "
        f"q AS (SELECT DISTINCT {probe_expr} AS value FROM {probe_rel}), "
        f"probes AS ({probe_rows}) "
        "SELECT p.value, count(b.bit) = "
        f"{k} AS bloom_hit "
        "FROM probes p LEFT JOIN bits b ON b.bit = p.bit GROUP BY p.value"
    )
