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


# --------------------------------------------------------------- count-min
def _cms_hash(value_col, d: int, width: int):
    """Row ``d``'s bucket for a value: 60-bit md5 of ``d:value`` mod
    width — the same derivation family as every other oracle hash here."""
    payload = F.concat_ws(":", F.lit(str(d)), F.col(value_col).cast("string"))
    h = F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(int(width)))


def count_min_build(
    df: DataFrame, value_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """``(d, w, cnt)`` — a count-min sketch (Cormode & Muthukrishnan
    2005) of the value column's frequency distribution: ``depth``
    independent md5 hash rows, each ``width`` integer counters.

    The streaming/sharded frequency primitive of a corpus pipeline
    (heavy-hitter tokens, hot URLs, per-shard frequency merge: sketches
    ADD cell-wise). All integers ⇒ the DuckDB oracle replays it
    cell-for-cell and estimates are hash-exact.

    Scale: one explode to ``depth`` rows per value and one
    map-side-combinable count; sketch size ``depth × width`` regardless
    of input. Merging shards = cell-wise sum of their sketches.
    """
    rows = df.select(
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
    return rows.groupBy("d", "w").agg(F.count("*").alias("cnt"))


def count_min_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """``(value, est)`` — min over the sketch's depth rows at each
    query's buckets; ``est ≥ true count`` always (one-sided error)."""
    q = queries.select(F.col(value_col).alias("value")).distinct()
    probes = q.select(
        "value",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_hash("value", d, width).alias("w"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("dw"),
    ).select("value", "dw.d", "dw.w")
    return (
        probes.join(sketch, ["d", "w"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def cms_oracle_sql(
    relation: str, value_expr: str, width: int, depth: int, query_sql: str
) -> str:
    """DuckDB replay: identical registers, identical min-probe. The
    ``query_sql`` relation must yield a ``value`` column."""
    hash_d = (
        "CAST('0x' || substr(md5(CAST({d} AS VARCHAR) || ':' || {v}), 1, 15) "
        f"AS BIGINT) % {width}"
    )
    row_selects = " UNION ALL ".join(
        f"SELECT {d} AS d, {hash_d.format(d=d, v=value_expr)} AS w "
        f"FROM {relation}"
        for d in range(depth)
    )
    probe_selects = " UNION ALL ".join(
        f"SELECT value, {d} AS d, "
        f"{hash_d.format(d=d, v='CAST(value AS VARCHAR)')} AS w FROM q"
        for d in range(depth)
    )
    return (
        f"WITH rows_ AS ({row_selects}), "
        "sk AS (SELECT d, w, count(*) AS cnt FROM rows_ GROUP BY d, w), "
        f"q AS ({query_sql}), "
        f"probes AS ({probe_selects}) "
        "SELECT p.value, min(coalesce(sk.cnt, 0)) AS est FROM probes p "
        "LEFT JOIN sk ON sk.d = p.d AND sk.w = p.w GROUP BY p.value"
    )


def cms_join_size_estimate(
    a: DataFrame, b: DataFrame, value_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """One-row ``(est_join_size, exact_join_size)`` — equi-join
    cardinality |A ⋈ B| estimated as the count-min inner product
    ``min_d Σ_w cmsA[d,w]·cmsB[d,w]`` (Cormode & Muthukrishnan 2005,
    §4.2; always ≥ the true size, one-sided like the point estimate).

    The query-planning primitive at 100 TB: both sketches are
    ``depth × width`` integers built in one map-side-combinable pass per
    side and the estimate is a ``depth``-row reduction — no shuffle of
    either table by the join key ever happens. All-integer ⇒ the DuckDB
    oracle replays it cell-for-cell. Exact size rides along for the
    contract check (and to show the estimator's upper-bound bias)."""
    ca = count_min_build(a, value_col, width, depth)
    cb = count_min_build(b, value_col, width, depth)
    prod = (
        ca.alias("x")
        .join(cb.alias("y"), ["d", "w"])
        .groupBy("d")
        .agg(F.sum(F.col("x.cnt") * F.col("y.cnt")).alias("ip"))
        .agg(F.min("ip").alias("est_join_size"))
    )
    exact = (
        a.select(F.col(value_col).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("na"))
        .join(
            b.select(F.col(value_col).alias("k"))
            .groupBy("k")
            .agg(F.count("*").alias("nb")),
            "k",
        )
        .agg(F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0)).alias("exact_join_size"))
    )
    return prod.crossJoin(exact)


def cms_join_size_oracle_sql(
    rel_a: str, rel_b: str, value_expr: str, width: int, depth: int
) -> str:
    """DuckDB replay of :func:`cms_join_size_estimate`."""
    hash_d = (
        "CAST('0x' || substr(md5(CAST({d} AS VARCHAR) || ':' || {v}), 1, 15) "
        f"AS BIGINT) % {width}"
    )

    def sketch(rel: str, name: str) -> str:
        rows = " UNION ALL ".join(
            f"SELECT {d} AS d, {hash_d.format(d=d, v=value_expr)} AS w "
            f"FROM {rel}"
            for d in range(depth)
        )
        return f"{name} AS (SELECT d, w, count(*) AS cnt FROM ({rows}) GROUP BY d, w)"

    return (
        f"WITH {sketch(rel_a, 'sa')}, {sketch(rel_b, 'sb')}, "
        "ip AS (SELECT sa.d, sum(sa.cnt * sb.cnt) AS ip FROM sa "
        "JOIN sb ON sb.d = sa.d AND sb.w = sa.w GROUP BY sa.d), "
        f"ex AS (SELECT coalesce(sum(na * nb), 0) AS exact_join_size FROM "
        f"(SELECT {value_expr} AS k, count(*) AS na FROM {rel_a} GROUP BY 1) x "
        f"JOIN (SELECT {value_expr} AS k, count(*) AS nb FROM {rel_b} "
        "GROUP BY 1) y USING (k)) "
        "SELECT CAST((SELECT min(ip) FROM ip) AS BIGINT) AS est_join_size, "
        "CAST(exact_join_size AS BIGINT) AS exact_join_size FROM ex"
    )


def hll_set_ops(
    df: DataFrame,
    value_col,
    type_col: str,
    type_a: str,
    type_b: str,
) -> DataFrame:
    """One row ``(d_a, d_b, d_union, d_intersect)`` — HLL register
    ALGEBRA: the union estimate comes from the merged (register-wise
    max) sketch — exact for HLL, the property that makes the sketch
    shardable — and the intersection is the standard
    inclusion-exclusion estimator ``(d_a + d_b) - d_union`` (can go
    negative on tiny overlaps; reported raw). Each estimate is the
    same corrected-free single-division estimator as
    :func:`approx_distinct_hll`, so all four values replay bit-exactly.

    Scale shape: three register aggregations over filtered slices of
    ONE pass family — 256 rows of state each, any input size."""
    val = value_col if not isinstance(value_col, str) else F.col(value_col)

    def _est(rows: DataFrame, name: str) -> DataFrame:
        reg, rho = hll_register_cols("_v")
        regs = (
            rows.select(val.cast("string").alias("_v"))
            .select(reg, rho)
            .groupBy("register")
            .agg(F.max("rho").alias("mr"))
        )
        term = F.expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), mr) AS DOUBLE)")
        agg = regs.agg(
            F.sum(term).alias("s_present"), F.count("*").alias("n_present")
        )
        s = F.col("s_present") + (F.lit(M) - F.col("n_present")).cast("double")
        return agg.select((F.lit(float(ALPHA_M2)) / s).alias(name))

    t = F.col(type_col)
    a = _est(df.where(t == type_a), "d_a")
    b = _est(df.where(t == type_b), "d_b")
    u = _est(df.where(t.isin([type_a, type_b])), "d_union")
    return (
        a.crossJoin(b)
        .crossJoin(u)
        .select(
            "d_a",
            "d_b",
            "d_union",
            ((F.col("d_a") + F.col("d_b")) - F.col("d_union")).alias(
                "d_intersect"
            ),
        )
    )
