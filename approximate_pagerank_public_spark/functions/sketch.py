"""Deterministic HyperLogLog distinct-count sketch (Flajolet et al.
2007), built to be bit-replayable in SQL.

A 100-TB training-data pipeline needs cardinality estimates (distinct
documents per shard, distinct URLs per crawl, vocabulary growth) where
exact ``count(distinct)`` would shuffle the full key set. Spark's
built-in ``approx_count_distinct`` is HLL++ but its hash is not
reproducible outside the JVM — this sketch derives everything from md5
so the DuckDB oracle replays it register-for-register:

- hash: first 15 hex chars of ``md5(value)`` → 60-bit integer ``v``
  (same derivation as the ``fingerprint``/MinHash oracles);
- register ``j = v mod 256`` (m=256, b=8);
- rank ``rho = 33 - msb_position(w)`` over the 32-bit window
  ``w = (v >> 8) & 0xFFFFFFFF`` (``rho = 33`` when ``w = 0``), with
  ``msb_position = length(bin(w))`` — integer string logic, no libm;
- estimate ``alpha_m · m² / S`` with ``S = Σ_j 2^(-M_j)`` and
  ``2^(-rho)`` computed as ``1.0 / (1 << rho)``.

Cross-engine exactness: every ``2^(-M_j)`` term is an exact power of
two in ``[2^-33, 1]`` and there are ≤256 of them, so every partial sum
fits in 41 bits of mantissa — the f64 sum is EXACT in any aggregation
order, and the single final division is one IEEE op. No small-range
(linear-counting) correction: ``ln()`` is not bit-standardized across
engines; the raw estimator keeps the sketch oracle-replayable (its
small-range bias is the documented trade).

Scale: one groupBy((group, register)) max + one groupBy(group) sum —
both map-side combinable; state per group is 256 rows regardless of
input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M = 256
# alpha_256 * 256^2, folded to ONE literal so both engines evaluate a
# single division (no multiply-order ambiguity)
ALPHA_M2 = repr(0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0)


def hll_register_cols(value_col: str):
    """(register, rho) Columns for one value — JVM expressions only."""
    h = F.conv(F.substring(F.md5(F.col(value_col)), 1, 15), 16, 10).cast("long")
    reg = F.pmod(h, F.lit(M)).alias("register")
    w = F.shiftright(h, 8).bitwiseAND(F.lit(4294967295))
    rho = (
        F.when(w == 0, F.lit(33))
        .otherwise(F.lit(33) - F.length(F.bin(w)))
        .alias("rho")
    )
    return reg, rho


def approx_distinct_hll(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """``(group_cols..., approx_distinct)`` — raw HLL estimate (double,
    full precision; truncate with ``_stable6`` for display/oracles)."""
    reg, rho = hll_register_cols(value_col)
    registers = (
        df.select(*group_cols, reg, rho)
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("mr"))
    )
    # variable-bit shift needs the SQL form (F.shiftleft wants a literal)
    term = F.expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), mr) AS DOUBLE)")
    per_group = registers.groupBy(*group_cols).agg(
        F.sum(term).alias("s_present"),
        F.count("*").alias("n_present"),
    )
    s = F.col("s_present") + (F.lit(M) - F.col("n_present")).cast("double")
    return per_group.select(
        *group_cols, (F.lit(float(ALPHA_M2)) / s).alias("approx_distinct")
    )


def hll_oracle_sql(relation: str, group_cols: list[str], value_expr: str) -> str:
    """The DuckDB replay of :func:`approx_distinct_hll` — identical
    register derivation and the same single-division estimate."""
    g = ", ".join(group_cols)
    return (
        f"WITH h AS (SELECT {g}, "
        f"CAST('0x' || substr(md5({value_expr}), 1, 15) AS BIGINT) AS v "
        f"FROM {relation}), "
        "rr AS (SELECT "
        f"{g}, v % {M} AS register, "
        "CASE WHEN ((v >> 8) & 4294967295) = 0 THEN 33 "
        "     ELSE 33 - length(bin((v >> 8) & 4294967295)) END AS rho "
        "FROM h), "
        f"regs AS (SELECT {g}, register, max(rho) AS mr FROM rr "
        f"GROUP BY {g}, register), "
        f"pg AS (SELECT {g}, "
        "sum(1.0 / CAST((CAST(1 AS BIGINT) << mr) AS DOUBLE)) AS s_present, "
        f"count(*) AS n_present FROM regs GROUP BY {g}) "
        f"SELECT {g}, {ALPHA_M2} / (s_present + CAST({M} - n_present AS DOUBLE)) "
        "AS approx_distinct FROM pg"
    )
