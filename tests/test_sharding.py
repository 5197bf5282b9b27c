"""Rendezvous sharding: uniformity ballpark and the minimal-disruption
property (N -> N+1 moves only ~1/(N+1) of the keys)."""

from pyspark.sql import functions as F

from approximate_pagerank_public_spark.functions.sharding import hrw_assign


def _keys(spark, n=4000):
    return spark.range(n).select(F.col("id").cast("string").alias("k"))


def test_hrw_uniform_ballpark(spark):
    a = hrw_assign(_keys(spark), "k", 8).groupBy("shard").count().toPandas()
    assert len(a) == 8
    # 4000 keys over 8 shards: expect 500 each, allow wide band
    assert a["count"].min() > 350
    assert a["count"].max() < 650


def test_hrw_minimal_disruption(spark):
    keys = _keys(spark)
    a = hrw_assign(keys, "k", 8).withColumnRenamed("shard", "s8")
    b = hrw_assign(keys, "k", 9).withColumnRenamed("shard", "s9")
    both = a.join(b, "k")
    moved = both.where(F.col("s8") != F.col("s9"))
    frac = moved.count() / 4000
    # exactly the keys whose new shard is 8 move; ~1/9 ≈ 0.111
    assert frac < 0.16
    # every moved key moved TO the new shard (the HRW guarantee)
    assert moved.where(F.col("s9") != 8).isEmpty()


def test_hrw_deterministic(spark):
    keys = _keys(spark, 500)
    a = {r["k"]: r["shard"] for r in hrw_assign(keys, "k", 5).collect()}
    b = {r["k"]: r["shard"] for r in hrw_assign(keys, "k", 5).collect()}
    assert a == b
