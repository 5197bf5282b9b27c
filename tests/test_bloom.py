"""Bloom filter: zero false negatives, shard-merge associativity,
FPR in the expected ballpark for the sized filter."""

from pyspark.sql import functions as F

from approximate_pagerank_public_spark.functions.bloom import (
    bloom_build,
    bloom_probe,
)


def _values(spark, lo, hi, name="v"):
    return spark.range(lo, hi).select(F.col("id").cast("string").alias(name))


def test_no_false_negatives(spark):
    members = _values(spark, 0, 500)
    bits = bloom_build(members, "v", m=4096, k=3)
    got = bloom_probe(bits, members, "v", m=4096, k=3)
    assert got.where(~F.col("bloom_hit")).isEmpty()


def test_fpr_ballpark(spark):
    members = _values(spark, 0, 500)
    others = _values(spark, 10_000, 12_000)
    bits = bloom_build(members, "v", m=4096, k=3)
    got = bloom_probe(bits, others, "v", m=4096, k=3).toPandas()
    fpr = got["bloom_hit"].mean()
    # (1 - e^{-3*500/4096})^3 ≈ 2.9e-2 — allow a generous band
    assert fpr < 0.10
    assert len(got) == 2000


def test_shard_merge_equals_single_build(spark):
    a = _values(spark, 0, 300)
    b = _values(spark, 300, 500)
    merged = bloom_build(a, "v", m=1024, k=2).unionAll(
        bloom_build(b, "v", m=1024, k=2)
    ).distinct()
    single = bloom_build(_values(spark, 0, 500), "v", m=1024, k=2)
    sm = {r["bit"] for r in merged.collect()}
    sg = {r["bit"] for r in single.collect()}
    assert sm == sg
