"""Multimodal plumbing + streaming edge ingest."""

import numpy as np
import pytest

from approximate_pagerank_public_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.synthesize_media(spark, n=30).cache()


def test_extract_features_shape(media):
    feats = multimodal.extract_features(media, dim=16).toPandas()
    assert len(feats) == 30
    assert feats["feature"].map(len).eq(16).all()
    # unit-norm stub features
    norms = feats["feature"].map(lambda f: np.linalg.norm(f))
    assert np.allclose(norms, 1.0)
    assert (feats["n_bytes"] >= 128).all()


def test_extract_features_deterministic(media):
    a = multimodal.extract_features(media, dim=8).toPandas().sort_values("media_id")
    b = multimodal.extract_features(media, dim=8).toPandas().sort_values("media_id")
    assert all(np.array_equal(x, y) for x, y in zip(a["feature"], b["feature"]))


def test_real_decode_is_stubbed(media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.extract_features(media, decode_stub=False).count()


def test_frame_sample_plan(media):
    plan = multimodal.frame_sample_plan(media, every_ms=500).toPandas()
    assert (plan["frame_ms"] % 500 == 0).all()
    assert plan.groupby("media_id").size().min() >= 2


def test_streaming_edge_counts(spark, transcripts_t1, tmp_path):
    """File-source stream of transcripts → incremental edge-observation
    counts; totals must match the batch derivation's raw counts."""
    from approximate_pagerank_public_spark.streaming.edge_stream import (
        edge_count_query,
        stream_edge_updates,
    )

    src_dir = str(tmp_path / "in")
    transcripts_t1.write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema(transcripts_t1.schema).parquet(src_dir)
    )
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = edge_count_query(stream_edge_updates(stream), ckpt, sink).start()
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    total_stream = got.groupBy().sum("count").first()[0]
    # batch equivalent over CLOSED windows only: append mode emits a
    # 1-hour window once the watermark passes its end, so rows in the
    # final (still-open) window are withheld — correct streaming
    # semantics, mirrored here.
    import pyspark.sql.functions as F

    max_ts = transcripts_t1.agg(F.max("ts")).first()[0]
    closed = transcripts_t1.where(
        F.window("ts", "1 hour").end <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR")
    )
    n_tool = closed.where(F.col("role") == "tool").count()
    n_all = closed.count()
    assert total_stream >= n_tool + n_all
    # and the stream must not fabricate rows beyond the full batch total
    n_tool_all = transcripts_t1.where(F.col("role") == "tool").count()
    assert total_stream <= n_tool_all + transcripts_t1.count()


def test_resize_images_plumbing(spark):
    from approximate_pagerank_public_spark.operators.multimodal import (
        resize_images,
        synthesize_media,
    )

    media = synthesize_media(spark, n=30)
    out = resize_images(media, target_w=32, target_h=32).toPandas()
    # only image rows; dims rewritten; payload scaled with pixel ratio
    assert (out["kind"] == "image").all()
    assert (out["width"] == 32).all() and (out["height"] == 32).all()
    src = media.where("kind = 'image'").toPandas().set_index("media_id")
    for _, r in out.iterrows():
        orig = src.loc[r["media_id"]]
        ratio = (32 * 32) / (orig["width"] * orig["height"])
        assert abs(len(r["payload"]) - len(orig["payload"]) * ratio) <= 1
    # determinism
    out2 = resize_images(media, target_w=32, target_h=32).toPandas()
    assert (
        out.sort_values("media_id")["payload"].map(bytes).tolist()
        == out2.sort_values("media_id")["payload"].map(bytes).tolist()
    )
    # the non-stub path refuses loudly instead of silently faking
    import pytest as _pytest

    with _pytest.raises(Exception):
        resize_images(media, 8, 8, decode_stub=False).collect()


def test_stateful_consecutive_edges_across_batches(spark, tmp_path):
    """applyInPandasWithState: a conversation's first turn in batch 2
    must link back to its last turn from batch 1 (state restored from
    the checkpoint between availableNow runs), and the union of both
    runs must equal the batch ETL's consecutive-turn edges."""
    import pandas as pd
    import pyspark.sql.functions as F
    from approximate_pagerank_public_spark.operators.etl import turn_entity
    from approximate_pagerank_public_spark.streaming.edge_stream import (
        stateful_consecutive_edges,
    )
    from pyspark.sql.window import Window

    rows = []
    for conv in ("a", "b"):
        for t in range(6):
            role = ["user", "assistant", "tool"][t % 3]
            rows.append((conv, t, role, f"text {conv}{t}", f"tool_{t % 2}", None))
    full = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        ).astype({"ts": "datetime64[ns]"})
    )
    src_dir, sink, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    b1 = full.where("turn_idx < 3")
    b2 = full.where("turn_idx >= 3")

    def run_once(batch):
        batch.write.mode("append").parquet(src_dir)
        stream = spark.readStream.schema(full.schema).parquet(src_dir)
        q = (
            stateful_consecutive_edges(stream)
            .writeStream.outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", sink)
            .start()
        )
        q.awaitTermination(120)

    run_once(b1)
    run_once(b2)
    got = (
        spark.read.parquet(sink)
        .select("conv_id", "src_entity", "dst_entity")
        .toPandas()
    )
    # batch ETL equivalent (same lag-over-turn_idx semantics)
    turns = full.select("conv_id", "turn_idx", turn_entity().alias("entity"))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    want = (
        turns.select(
            "conv_id",
            F.lag("entity").over(w).alias("src_entity"),
            F.col("entity").alias("dst_entity"),
        )
        .where(F.col("src_entity").isNotNull())
        .toPandas()
    )
    key = ["conv_id", "src_entity", "dst_entity"]
    assert sorted(map(tuple, got[key].values)) == sorted(map(tuple, want[key].values))
    # the cross-batch link (turn 2 -> turn 3) exists per conversation
    cross = got[(got["conv_id"] == "a")]
    assert len(got) == len(want) == 10  # 5 links x 2 convs


def test_link_group_handles_out_of_order_chunks():
    """applyInPandasWithState gives no intra-group chunk ordering: a
    later Arrow chunk may hold EARLIER turns. The linker must produce
    the same edges regardless of chunk order/split (ADVICE r1)."""
    import pandas as pd

    from approximate_pagerank_public_spark.streaming.edge_stream import _link_group

    class FakeState:
        def __init__(self):
            self.exists = False
            self.get = None

        def update(self, v):
            self.exists, self.get = True, tuple(v)

    def mk(turns):
        return pd.DataFrame(
            {
                "conv_id": "c",
                "turn_idx": turns,
                "role": ["user", "tool", "assistant", "tool", "user", "assistant"][
                    : len(turns)
                ],
                "tool": [f"t{i}" for i in turns],
            }
        )

    full = mk([0, 1, 2, 3, 4, 5])

    def run(chunks):
        st = FakeState()
        outs = list(_link_group(("c",), iter(chunks), st))
        return pd.concat(outs).reset_index(drop=True), st.get

    in_order, st1 = run([full.iloc[:3], full.iloc[3:]])
    reversed_chunks, st2 = run([full.iloc[3:], full.iloc[:3]])
    one_chunk, st3 = run([full])
    key = ["src_entity", "dst_entity"]
    assert sorted(map(tuple, in_order[key].values)) == sorted(
        map(tuple, one_chunk[key].values)
    )
    assert sorted(map(tuple, reversed_chunks[key].values)) == sorted(
        map(tuple, one_chunk[key].values)
    )
    assert len(one_chunk) == 5
    assert st1 == st2 == st3 == (5, "role:assistant")
