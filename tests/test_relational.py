"""Relational OLAP operators: hand goldens + plan-shape assertions
(the correctness gate is the DuckDB contract oracle; these tests pin
the integer-cents arithmetic and that Catalyst gets to do its job)."""

import io
from contextlib import redirect_stdout

import pandas as pd


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_hand_golden(spark):
    from approximate_pagerank_public_spark.operators.relational import (
        pricing_summary,
    )

    li = spark.createDataFrame(
        pd.DataFrame(
            {
                "l_returnflag": ["A", "A", "N"],
                "l_linestatus": ["F", "F", "O"],
                "l_quantity": [2.0, 3.0, 1.0],
                "l_extendedprice": [10.50, 20.25, 5.00],
                "l_discount": [0.10, 0.00, 0.05],
                "l_shipdate": pd.to_datetime(
                    ["1997-01-01", "1998-01-01", "1999-06-01"]
                ),
            }
        )
    )
    got = (
        pricing_summary(li, cutoff="1998-09-02")
        .toPandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    # the 1999 row falls past the cutoff
    assert len(got) == 1
    assert got.loc[0, "sum_qty"] == 5
    assert got.loc[0, "sum_base_cents"] == 1050 + 2025
    # 1050*(100-10) + 2025*100
    assert got.loc[0, "sum_disc_cpct"] == 1050 * 90 + 2025 * 100
    assert got.loc[0, "count_order"] == 2


def test_regional_revenue_plan_broadcasts_dims_and_pushes_filters(spark):
    from approximate_pagerank_public_spark.operators.relational import (
        regional_revenue,
    )
    from approximate_pagerank_public_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    df = regional_revenue(
        load_table(spark, sf, "region"),
        load_table(spark, sf, "nation"),
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "supplier"),
    )
    plan = _plan(df)
    # the region-name and order-date predicates reach the parquet scans
    assert "PushedFilters" in plan and "r_name" in plan
    assert "o_orderdate" in plan
    # dictionary-sized dims ride broadcast joins at this SF
    assert "BroadcastHashJoin" in plan
    # and the result matches the fixture's own arithmetic
    rows = df.collect()
    assert all(r["revenue_cpct"] > 0 for r in rows)


def test_order_priority_counts_hand_golden(spark):
    from approximate_pagerank_public_spark.operators.relational import (
        order_priority_counts,
    )

    orders = spark.createDataFrame(
        pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3],
                "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH"],
                "o_orderdate": pd.to_datetime(
                    ["1996-10-05", "1996-11-01", "1996-12-01"]
                ),
            }
        )
    )
    li = spark.createDataFrame(
        pd.DataFrame(
            {
                "l_orderkey": [1, 1, 2, 3],
                "l_shipdate": pd.to_datetime(
                    # order 1: one line 10 days out, one 90 days out (late)
                    # order 2: 30 days out (on time); order 3: 61 days (late)
                    ["1996-10-15", "1997-01-03", "1996-12-01", "1997-01-31"]
                ),
            }
        )
    )
    got = (
        order_priority_counts(orders, li, late_days=60)
        .toPandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    assert got["o_orderpriority"].tolist() == ["1-URGENT", "2-HIGH"]
    # order 1 late (semi-join counts it ONCE despite two lines), order 3 late
    assert got["order_count"].tolist() == [1, 1]


def test_returned_revenue_topk_hand_golden(spark):
    from approximate_pagerank_public_spark.operators.relational import (
        returned_revenue_topk,
    )

    customer = spark.createDataFrame(
        pd.DataFrame(
            {
                "c_custkey": [10, 11],
                "c_name": ["a", "b"],
                "c_nationkey": [0, 0],
                "c_acctbal": [12.34, 56.78],
            }
        )
    )
    nation = spark.createDataFrame(
        pd.DataFrame({"n_nationkey": [0], "n_name": ["X"]})
    )
    orders = spark.createDataFrame(
        pd.DataFrame(
            {
                "o_orderkey": [1, 2],
                "o_custkey": [10, 11],
                "o_orderdate": pd.to_datetime(["1996-10-05", "1996-11-01"]),
            }
        )
    )
    li = spark.createDataFrame(
        pd.DataFrame(
            {
                "l_orderkey": [1, 1, 2],
                "l_returnflag": ["R", "N", "R"],
                "l_extendedprice": [10.00, 99.00, 20.00],
                "l_discount": [0.10, 0.00, 0.00],
            }
        )
    )
    got = (
        returned_revenue_topk(customer, orders, li, nation, k=20)
        .toPandas()
        .reset_index(drop=True)
    )
    # customer 11: 2000*100 = 200000 cpct; customer 10: 1000*90 = 90000
    assert got["c_custkey"].tolist() == [11, 10]
    assert got["revenue_cpct"].tolist() == [2000 * 100, 1000 * 90]
    assert got["acctbal_cents"].tolist() == [5678, 1234]
    assert got["n_name"].tolist() == ["X", "X"]
