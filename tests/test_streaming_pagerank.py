"""Continuous PageRank maintenance (streaming/pagerank_stream.py):
two availableNow micro-batches over a file stream must produce the
SAME entity-edge set as the batch ETL over the full table, and a
warm-started converged PageRank matching the batch pipeline's."""

import json

import numpy as np
import pytest

from approximate_pagerank_public_spark.streaming.pagerank_stream import (
    pagerank_maintenance_query,
)


@pytest.fixture(scope="module")
def maintained(spark, tmp_path_factory):
    from approximate_pagerank_public_spark.sources.transcripts import (
        synthesize_transcripts,
    )

    tmp = tmp_path_factory.mktemp("prstream")
    full = synthesize_transcripts(spark, n_convs=150, seed=7).cache()
    # split on turn_idx: per conversation, batch 1 carries the early
    # turns and batch 2 the later ones (monotone per conv — what an
    # append-only transcript table delivers)
    b1 = full.where("turn_idx < 4")
    b2 = full.where("turn_idx >= 4")
    src_dir, state, ckpt = (str(tmp / d) for d in ("in", "state", "ck"))

    def run_once(batch):
        batch.write.mode("append").parquet(src_dir)
        stream = spark.readStream.schema(full.schema).parquet(src_dir)
        q = pagerank_maintenance_query(stream, state, ckpt).start()
        q.awaitTermination(180)

    run_once(b1)
    run_once(b2)
    return full, state


def _latest(spark, state, name):
    import os

    with open(os.path.join(state, name, "_LATEST")) as f:
        v = f.read().strip()
    return spark.read.parquet(os.path.join(state, name, v))


def test_streamed_edge_set_equals_batch_etl(spark, maintained):
    from approximate_pagerank_public_spark.operators.etl import (
        derive_entity_edges,
    )

    full, state = maintained
    got = {
        (r["src_entity"], r["dst_entity"])
        for r in _latest(spark, state, "entity_edges").collect()
    }
    want = {
        (r["src_entity"], r["dst_entity"])
        for r in derive_entity_edges(full).collect()
    }
    assert got == want


def test_streamed_ranks_match_batch_pipeline(spark, maintained):
    from approximate_pagerank_public_spark.operators.pagerank import pagerank
    from approximate_pagerank_public_spark.plans.graph import Graph

    full, state = maintained
    g = Graph.from_transcripts(full)
    res = pagerank(g, alpha=0.8, tol=1e-6, max_iter=100)
    want = (
        res.ranks()
        .join(g.vertex_names, "id")
        .select("entity", "rank")
        .toPandas()
        .set_index("entity")["rank"]
    )
    got = (
        _latest(spark, state, "ranks")
        .toPandas()
        .set_index("entity")["rank"]
    )
    assert set(got.index) == set(want.index)
    got = got.reindex(want.index)
    # both runs stop at L1 <= 1e-6 of their own iterate; each is within
    # ~tol*alpha/(1-alpha) of the common fixpoint
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy(), atol=1e-5)
    g.unpersist()


def test_manifest_records_warm_start(spark, maintained):
    import os

    _full, state = maintained
    lines = [
        json.loads(line)
        for line in open(os.path.join(state, "manifest.jsonl"))
    ]
    assert [m["batch_id"] for m in lines] == [0, 1]
    assert lines[0]["warm_start"] is False
    assert lines[1]["warm_start"] is True
    assert lines[0]["converged"] and lines[1]["converged"]
    # the graph grows between batches, so the vertex/edge counts must too
    assert lines[1]["num_vertices"] >= lines[0]["num_vertices"]
    assert lines[1]["num_edges"] > lines[0]["num_edges"]
