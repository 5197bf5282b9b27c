"""Skew splitting: identical results, better partition balance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.functions import golden
from approximate_pagerank_public_spark.operators.pagerank import pagerank
from approximate_pagerank_public_spark.plans.graph import Graph
from approximate_pagerank_public_spark.sources.generators import gnp_edges


@pytest.fixture(scope="module")
def skewed_edges(spark):
    # 60k edges, 30% aimed at a handful of hub dsts
    return gnp_edges(spark, 2000, 60000, seed=7, skew=0.3, partitions=8).cache()


def _partition_sizes(df):
    return (
        df.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .toPandas()["count"]
        .to_numpy()
    )


def test_skew_split_results_identical(spark, skewed_edges):
    g_plain = Graph(skewed_edges, num_partitions=8)
    g_split = Graph(skewed_edges, num_partitions=8, skew_split=True, salt_buckets=8)
    assert g_plain.num_vertices == g_split.num_vertices
    r1 = pagerank(g_plain, mode="broadcast", max_iter=10, tol=0.0)
    r2 = pagerank(g_split, mode="broadcast", max_iter=10, tol=0.0)
    assert np.allclose(r1.ranks_np, r2.ranks_np, atol=1e-12)
    g_plain.unpersist()
    g_split.unpersist()


def test_skew_split_block_bfs_parity(spark, skewed_edges):
    """Salted layouts overlap dst sets across blocks — the frontier-
    sparse BFS must fall back to the minimum.at merge and still match
    the frontier-join result exactly."""
    from approximate_pagerank_public_spark.operators.traversal import (
        multi_source_bfs,
        multi_source_bfs_block,
    )

    g = Graph(skewed_edges, num_partitions=8, skew_split=True,
              hot_dst_threshold=1024, salt_buckets=8)
    sources = [0, 7, 99]
    a = multi_source_bfs(g, sources).toPandas()
    b = multi_source_bfs_block(g, sources).toPandas()
    key = ["source", "id", "dist"]
    assert sorted(map(tuple, a[key].values)) == sorted(map(tuple, b[key].values))
    g.unpersist()


def test_skew_split_improves_balance(spark, skewed_edges):
    g_plain = Graph(skewed_edges, num_partitions=8)
    g_split = Graph(
        skewed_edges, num_partitions=8, skew_split=True, hot_dst_threshold=1024, salt_buckets=8
    )
    s_plain = _partition_sizes(g_plain.edges)
    s_split = _partition_sizes(g_split.edges)
    # imbalance = max/mean; salting must not be worse
    imb_plain = s_plain.max() / s_plain.mean()
    imb_split = s_split.max() / s_split.mean()
    assert imb_split <= imb_plain + 0.05
    g_plain.unpersist()
    g_split.unpersist()
