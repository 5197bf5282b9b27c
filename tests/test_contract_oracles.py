"""Contract-level oracle invariants that the drive_contract comparison
depends on but cannot itself localize when they break:

- the NumPy convergence replay in ``__spark_entry__`` finds the SAME
  iteration count as the engine (the pagerank_top20 / multi_ppr_top10
  oracles unroll exactly that many CTE iterations);
- simhash(md5) is bit-identical to its DuckDB bit-plane replay;
- the IVF oracle's literal centroids equal what ``ivf_ann_topk`` trains
  at query time.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def graph_sf0001(spark):
    g = E._graph(spark, SF)
    yield g
    g.unpersist()


def test_replay_iteration_count_matches_engine_pagerank(spark, graph_sf0001):
    from approximate_pagerank_public_spark.operators.pagerank import pagerank

    res = pagerank(graph_sf0001, alpha=0.8, tol=1e-6, max_iter=100)
    k = E._replay_convergent_iters(None, sf_dir=SF)
    assert res.converged
    assert k == res.iterations


def test_replay_iteration_count_matches_engine_multi_ppr(spark, graph_sf0001):
    from approximate_pagerank_public_spark.operators.pagerank import multi_ppr

    sources = list(range(8))
    res = multi_ppr(graph_sf0001, sources, alpha=0.8, tol=1e-6, max_iter=100)
    k = E._replay_convergent_iters(sources, sf_dir=SF)
    assert res.converged
    assert k == res.iterations


def test_simhash_md5_matches_duckdb_replay(spark):
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "The quick brown fox jumps over the lazy dog",
                "the  QUICK brown\tfox",
                "pack my box with five dozen liquor jugs",
                "x",
            ],
        }
    )
    from approximate_pagerank_public_spark.operators.dedup import simhash

    got = (
        simhash(spark.createDataFrame(docs), hash_method="md5")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.sql(E._simhash_oracle()).df().sort_values("doc_id").reset_index(drop=True)
    assert got["simhash"].tolist() == want["simhash"].tolist()


def test_simhash_xxhash64_option_still_works(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "a b c d"]})
    )
    from approximate_pagerank_public_spark.operators.dedup import simhash

    out = simhash(docs, hash_method="xxhash64").toPandas()
    assert len(out) == 2 and out["simhash"].dtype == np.int64


def test_ivf_oracle_centroids_match_engine_training(spark):
    """The oracle recomputes the k-means centroids outside Spark; they
    must equal (bit-exact) the ones ivf_ann_topk trains from its
    orderBy(id).limit(sample) collect."""
    from pyspark.sql import functions as F

    from approximate_pagerank_public_spark.operators.similarity import (
        _kmeans_centroids,
    )

    d = E._oracle_sf_dir()
    emb = E._emb_double(spark, d)
    rows = emb.orderBy("vec_id").limit(4096).select("embedding").collect()
    sample = np.asarray([r[0] for r in rows], dtype=np.float64)
    engine_cents = _kmeans_centroids(sample, 8, 5)
    oracle_cents = E._ivf_centroids(8, 5, 4096)
    np.testing.assert_array_equal(engine_cents, oracle_cents)
