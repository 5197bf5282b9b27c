"""Deterministic split / stratified sample (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.operators.sampling import (
    dataset_split,
    split_thresholds,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("lang"),
    )


def test_split_fractions_and_determinism(docs):
    out = dataset_split(docs, fractions={"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # 2000 rows: expect roughly 1600/200/200 (binomial, generous bounds)
    assert 1480 <= counts["train"] <= 1720
    assert 120 <= counts["val"] <= 280
    assert 120 <= counts["test"] <= 280
    again = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    first = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    assert again == first


def test_split_growth_invariance(docs, spark):
    """Adding rows never reassigns existing ones (randomSplit can't do this)."""
    small = {r["doc_id"]: r["split"] for r in dataset_split(docs.where("doc_id < 500")).collect()}
    big = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    assert all(big[k] == v for k, v in small.items())


def test_split_thresholds_match_assignment(docs):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    th = split_thresholds(fr)
    assert th == [("train", 800000), ("val", 900000), ("test", 1000000)]


def test_split_bad_fractions_raises(docs):
    with pytest.raises(ValueError):
        dataset_split(docs, fractions={"a": 0.5, "b": 0.4})


def test_stratified_sample_k_per_group_and_uniformity(docs):
    out = stratified_sample(docs, k=7)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {str(i): 7 for i in range(5)}
    ranks = [r["sample_rank"] for r in out.where("lang = '0'").collect()]
    assert sorted(ranks) == list(range(1, 8))


def test_stratified_sample_partitioning_invariant(docs):
    a = {(r["lang"], r["doc_id"]) for r in stratified_sample(docs, k=5).collect()}
    b = {
        (r["lang"], r["doc_id"])
        for r in stratified_sample(docs.repartition(13), k=5).collect()
    }
    assert a == b


def test_quality_resample_deterministic_and_weight_monotone(spark):
    from approximate_pagerank_public_spark.operators.sampling import (
        quality_resample,
    )

    df = spark.createDataFrame(
        [(i, 1.0 if i < 100 else (0.0 if i < 200 else 0.5))
         for i in range(1000)],
        "doc_id long, quality double",
    )
    kept = quality_resample(df).toPandas()
    # weight 1.0 -> always kept; weight 0.0 -> never kept
    assert (kept.quality >= 0.5).all()
    assert set(range(100)) <= set(kept.doc_id)
    half = kept[kept.quality == 0.5]
    # 800 rows at p=0.5: keep fraction within loose binomial bounds
    assert 300 <= len(half) <= 500
    # pure function of (seed, id): re-run identical
    again = quality_resample(df).toPandas()
    assert sorted(again.doc_id) == sorted(kept.doc_id)
    # growth-invariance: thinning a subset never flips decisions
    sub = quality_resample(df.where("doc_id < 500")).toPandas()
    assert set(sub.doc_id) == {d for d in kept.doc_id if d < 500}


def test_mixture_resample_hits_targets(spark):
    """Kept counts track the basis-point targets (exact thresholds ⇒
    per-group kept ≤ ceil(expected) and the binding group keeps ~all)."""
    from approximate_pagerank_public_spark.operators.sampling import (
        mixture_resample,
    )

    rows = [(i, f"s{i % 4}") for i in range(4000)]  # 1000 docs per source
    df = spark.createDataFrame(rows, "doc_id long, source string")
    targets = {"s0": 5000, "s1": 3000, "s2": 1000, "s3": 1000}
    out = mixture_resample(df, targets, "source", "doc_id", "mix")
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # T = min_g (1000*10000) div bp = (1000*10000) div 5000 = 2000
    # expected kept: s0 = 1000 (binding), s1 = 600, s2 = 200, s3 = 200
    # md5 thinning is exact-threshold, so counts are within ~3 sigma of
    # n*thr/1e6; thresholds themselves are exact:
    assert got["s0"] == 1000  # thr = 1e6 → keep all
    for s, exp in [("s1", 600), ("s2", 200), ("s3", 200)]:
        assert abs(got[s] - exp) < 80, (s, got[s], exp)
