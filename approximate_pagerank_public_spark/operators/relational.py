"""Classic relational OLAP over the TPC-H-style fixture tables
(pricing summary, segment top-orders, regional revenue) — the
conventional analytics surface next to the link-graph operators, kept
cross-engine hash-exact by doing ALL money arithmetic in integer cents.

Prices/discounts in the fixtures are 2-dp doubles; ``round(x·100)`` is
bit-identical in Spark and DuckDB because x·100 is always within one
ulp of an integer (never near a .5 tie). Revenue uses
``price_cents · (100 − disc_pct)`` — exact BIGINT "cent·percent"
units; divide by 10⁴ only at the display edge (one IEEE division of an
exact integer, still bit-exact).

Scale shape: pure declarative DataFrame plans — Catalyst pushes the
date/segment filters into the parquet scans, broadcasts the
dictionary-sized dims (region, nation, supplier, customer at any SF
where they fit the broadcast threshold — AQE decides from measured
sizes, nothing is pinned), and every aggregate is map-side combinable.
No UDFs, no collects, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


def _revenue_cpct(price_col: str = "l_extendedprice", disc_col: str = "l_discount") -> F.Column:
    """price·(1−discount) in exact integer cent·percent units."""
    disc_pct = F.round(F.col(disc_col) * 100).cast("long")
    return _cents(price_col) * (F.lit(100) - disc_pct)


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary per (returnflag, linestatus):
    shipped-by-``cutoff`` quantity, base price (cents), discounted
    revenue (cent·percent), and order count — all exact integers."""
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_cents"),
            F.sum(_revenue_cpct()).alias("sum_disc_cpct"),
            F.count("*").alias("count_order"),
        )
    )


def segment_top_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1997-06-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-shaped: the ``k`` highest-revenue orders of one market
    segment placed before ``date`` with lines still shipping after it;
    ties → smaller orderkey. Revenue in exact cent·percent units."""
    d = F.lit(date).cast("timestamp")
    return (
        customer.where(F.col("c_mktsegment") == segment)
        .join(orders.where(F.col("o_orderdate") < d), F.col("c_custkey") == F.col("o_custkey"))
        .join(
            lineitem.where(F.col("l_shipdate") > d),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(F.sum(_revenue_cpct()).alias("revenue_cpct"))
        .orderBy(F.col("revenue_cpct").desc(), F.col("l_orderkey").asc())
        .limit(k)
        .select("l_orderkey", "revenue_cpct", "o_orderpriority")
    )


def regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q5-shaped: per-nation revenue in one region over a date
    window, counting only lines whose supplier sits in the customer's
    nation (the classic local-supplier constraint — a 6-table join)."""
    return (
        region.where(F.col("r_name") == region_name)
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(customer, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(_revenue_cpct()).alias("revenue_cpct"))
    )


def order_priority_counts(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-10-01",
    date_to: str = "1997-01-01",
    late_days: int = 60,
) -> DataFrame:
    """TPC-H Q4-shaped: per order-priority count of the quarter's orders
    with ≥1 late line. The classic Q4 lateness predicate is
    ``l_commitdate < l_receiptdate``; the fixture lineitem carries only
    ``l_shipdate``, so the shape keeps the EXISTS semi-join but tests
    ``l_shipdate > o_orderdate + late_days`` instead (timestamp
    arithmetic — exact in both engines). Plan: the date filter pushes to
    the orders scan; the EXISTS is one LEFT SEMI join that hashes on the
    order key with the lateness inequality as a residual condition —
    no correlated subquery, no fan-out."""
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS")
    )
    return (
        o.join(lineitem, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def returned_revenue_topk(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-10-01",
    date_to: str = "1997-01-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-shaped: the ``k`` customers with the highest returned-
    item revenue (``l_returnflag = 'R'``) for orders placed in one
    quarter, with their nation. Revenue in exact cent·percent units,
    account balance in cents; ties → smaller custkey. Plan: date filter
    pushed to the orders scan, returnflag filter pushed to the lineitem
    scan, nation broadcast by AQE, one map-side-combinable aggregate."""
    return (
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            lineitem.where(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            "c_custkey",
            "c_name",
            _cents("c_acctbal").alias("acctbal_cents"),
            "n_name",
        )
        .agg(F.sum(_revenue_cpct()).alias("revenue_cpct"))
        .orderBy(F.col("revenue_cpct").desc(), F.col("c_custkey").asc())
        .limit(k)
        .select(
            "c_custkey", "c_name", "revenue_cpct", "acctbal_cents", "n_name"
        )
    )


def promo_revenue_share(
    lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    """TPC-H Q14-shaped: per ship-year, the revenue fraction from PROMO
    parts. ``promo_cpct``/``total_cpct`` are exact integers; the share
    is their single IEEE division — bit-exact cross-engine."""
    rev = _revenue_cpct()
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias(
                "promo_cpct"
            ),
            F.sum(rev).alias("total_cpct"),
        )
        .select(
            "ship_year",
            "promo_cpct",
            "total_cpct",
            (
                F.col("promo_cpct").cast("double")
                / F.col("total_cpct").cast("double")
            ).alias("promo_share"),
        )
    )


def volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7-shaped volume shipping: revenue flowing between two
    nations (supplier side ↔ customer side, both directions) by ship
    year.  Plan: the two-nation filter lands on the broadcast nation
    dim twice (supp/cust aliases); the cross-nation predicate is a
    residual on the hash join, every aggregate map-side combinable."""
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).where(F.col("supp_nation").isin(nation_a, nation_b))
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).where(F.col("cust_nation").isin(nation_a, nation_b))
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    )
    return (
        li.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_revenue_cpct()).alias("revenue_cpct"))
    )


def market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    region_name: str = "EUROPE",
    supp_nation: str = "NATION_3",
    p_type: str = "ECONOMY",
    date_from: str = "1995-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q8-shaped market share: of all ``p_type`` revenue sold
    into one region's customers, the fraction supplied from one
    nation, per order year.  Numerator/denominator stay exact BIGINT
    cent·percent; the share is ONE IEEE division of those two ints,
    stable6-truncated at the edge (bit-identical cross-engine)."""
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_name")
    )
    joined = (
        region.where(F.col("r_name") == region_name)
        .join(n_cust, F.col("cr_key") == F.col("r_regionkey"))
        .join(customer, F.col("c_nationkey") == F.col("cn_key"))
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(part.where(F.col("p_type") == p_type), F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n_supp, F.col("s_nationkey") == F.col("sn_key"))
    )
    num = F.sum(
        F.when(F.col("supp_name") == supp_nation, _revenue_cpct()).otherwise(F.lit(0))
    )
    den = F.sum(_revenue_cpct())
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            num.alias("nation_cpct"),
            den.alias("total_cpct"),
        )
        .select(
            "o_year",
            "nation_cpct",
            "total_cpct",
            (
                F.floor(
                    (
                        F.col("nation_cpct").cast("double")
                        / F.col("total_cpct").cast("double")
                    )
                    * 1000000.0
                )
                / 1000000.0
            ).alias("mkt_share"),
        )
    )


def top_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-07-01",
    date_to: str = "1996-10-01",
) -> DataFrame:
    """TPC-H Q15-shaped: the supplier(s) with the maximum quarter
    revenue (exact integer cent·percent — the max and the equality
    join are on exact BIGINTs, so ties reproduce identically).  Plan:
    one map-side-combinable agg over the date-pruned lineitem scan, a
    1-row max, and a broadcast-joined supplier dim."""
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue_cpct()).alias("total_revenue_cpct"))
    )
    mx = rev.agg(F.max("total_revenue_cpct").alias("mr"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue_cpct") == F.col("mr"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue_cpct")
        )
    )


def bracket_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brackets: tuple = (
        ("Brand#1", 1, 5, 1, 11),
        ("Brand#13", 1, 10, 10, 20),
        ("Brand#20", 1, 15, 20, 30),
    ),
) -> DataFrame:
    """TPC-H Q19-shaped bracketed revenue: an OR of (brand, size
    range, quantity range) predicates over lineitem ⋈ part — the
    classic pushed-disjunction join.  One BIGINT revenue + line count
    row.  Plan: part predicates prune the broadcast dim before the
    join; quantity residuals evaluate in codegen."""
    qty = F.round(F.col("l_quantity")).cast("long")
    conds = None
    for brand, smin, smax, qmin, qmax in brackets:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("p_size").between(smin, smax))
            & (qty >= qmin)
            & (qty <= qmax)
        )
        conds = c if conds is None else (conds | c)
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .where(conds)
        .agg(
            F.coalesce(F.sum(_revenue_cpct()), F.lit(0)).alias("revenue_cpct"),
            F.count("*").alias("n_lines"),
        )
    )
