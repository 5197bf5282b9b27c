"""HLL sketch: bit-exact vs a pure-Python register replay + accuracy."""

import hashlib

from approximate_pagerank_public_spark.functions.sketch import (
    ALPHA_M2,
    M,
    approx_distinct_hll,
)


def _golden_hll(values):
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        reg = h % M
        w = (h >> 8) & 0xFFFFFFFF
        rho = 33 if w == 0 else 33 - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    s = sum(1.0 / (1 << r) for r in regs.values()) + (M - len(regs))
    return float(ALPHA_M2) / s


def test_hll_bit_exact_vs_python_replay(spark):
    vals = [f"doc-{i}" for i in range(1000)] + [f"doc-{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "text string")
    got = approx_distinct_hll(df, [], "text").first()["approx_distinct"]
    gold = _golden_hll(vals)
    # same registers, same exact power-of-two sum, same single division
    assert got == gold


def test_hll_accuracy_within_sigma(spark):
    n = 5000
    df = spark.createDataFrame([(f"u-{i}",) for i in range(n)], "text string")
    got = approx_distinct_hll(df, [], "text").first()["approx_distinct"]
    # m=256 → relative error σ ≈ 1.04/16 = 6.5%; allow 3σ
    assert abs(got - n) / n < 0.20


def test_hll_groups_independent(spark):
    rows = [("a", f"x-{i}") for i in range(800)] + [
        ("b", f"x-{i}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, text string")
    got = {
        r["g"]: r["approx_distinct"]
        for r in approx_distinct_hll(df, ["g"], "text").collect()
    }
    assert got["a"] == _golden_hll([f"x-{i}" for i in range(800)])
    assert got["b"] == _golden_hll([f"x-{i}" for i in range(50)])
    assert got["a"] > got["b"]


def test_cms_never_underestimates_and_exact_when_wide(spark):
    from collections import Counter

    from approximate_pagerank_public_spark.functions.sketch import (
        count_min_build,
        count_min_estimate,
    )

    vals = [f"tok{i % 37}" for i in range(2000)] + ["hot"] * 500
    true = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "value string")
    # narrow sketch: one-sided error only
    sk = count_min_build(df, "value", width=64, depth=4)
    q = spark.createDataFrame([(v,) for v in true], "value string")
    est = {
        r["value"]: r["est"]
        for r in count_min_estimate(sk, q, "value", width=64, depth=4).collect()
    }
    assert all(est[v] >= c for v, c in true.items())
    # wide sketch: exact (38 distinct values, 4096 cells)
    sk2 = count_min_build(df, "value", width=4096, depth=4)
    est2 = {
        r["value"]: r["est"]
        for r in count_min_estimate(sk2, q, "value", width=4096, depth=4).collect()
    }
    assert est2 == dict(true)


def test_cms_shard_merge_additive(spark):
    from pyspark.sql import functions as F

    from approximate_pagerank_public_spark.functions.sketch import (
        count_min_build,
        count_min_estimate,
    )

    a = spark.createDataFrame([("x",)] * 10 + [("y",)] * 3, "value string")
    b = spark.createDataFrame([("x",)] * 5, "value string")
    ska = count_min_build(a, "value", width=256, depth=2)
    skb = count_min_build(b, "value", width=256, depth=2)
    merged = (
        ska.unionAll(skb).groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))
    )
    q = spark.createDataFrame([("x",), ("y",)], "value string")
    est = {
        r["value"]: r["est"]
        for r in count_min_estimate(merged, q, "value", width=256, depth=2).collect()
    }
    assert est == {"x": 15, "y": 3}


def test_cms_join_size_upper_bound_and_exactish(spark):
    from approximate_pagerank_public_spark.functions.sketch import (
        cms_join_size_estimate,
    )
    from pyspark.sql import functions as F

    a = spark.range(500).select((F.col("id") % 50).cast("string").alias("k"))
    b = spark.range(300).select((F.col("id") % 60).cast("string").alias("k"))
    row = cms_join_size_estimate(a, b, "k", width=1024, depth=4).collect()[0]
    # one-sided: the CM inner product never underestimates
    assert row["est_join_size"] >= row["exact_join_size"]
    # 50/60 keys in 1024 buckets: collisions are rare — estimate close
    assert row["est_join_size"] <= int(1.2 * row["exact_join_size"]) + 10
    # exact join size from first principles: keys 0..49 appear 10x in a;
    # in b keys 0..59 appear 5x -> sum over 50 shared keys of 10*5
    assert row["exact_join_size"] == 50 * 10 * 5
