"""Streaming sketches: the cumulative state after all micro-batches
equals the batch sketch cell-for-cell (HLL registers and count-min
counters), and the estimates off the final snapshots are bit-identical
to the batch estimators."""

from pyspark.sql import functions as F

from approximate_pagerank_public_spark.functions.sketch import (
    approx_distinct_hll,
    count_min_build,
    count_min_estimate,
    hll_register_cols,
)
from approximate_pagerank_public_spark.streaming.sketch_stream import (
    estimate_from_registers,
    stateful_cms,
    stateful_hll,
)


def _rows(spark):
    data = [(i, "a" if i % 3 else "b", f"text-{i % 137}") for i in range(600)]
    return spark.createDataFrame(data, "doc_id long, role string, text string")


def test_streaming_hll_matches_batch(spark, tmp_path):
    df = _rows(spark)
    src = str(tmp_path / "in")
    # two micro-batch files so state genuinely crosses batches
    df.where(F.col("doc_id") < 300).write.mode("overwrite").parquet(src)
    df.where(F.col("doc_id") >= 300).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_hll(stream, "role", "text")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("hllstream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # final register value per key = LAST update emitted for it; with
    # monotone registers that's simply the max emitted
    snap = (
        spark.sql("SELECT * FROM hllstream")
        .groupBy("group", "register")
        .agg(F.max("mr").alias("mr"))
    )
    got_regs = {
        (r["group"], r["register"]): r["mr"] for r in snap.collect()
    }
    reg, rho = hll_register_cols("text")
    want_regs = {
        (r["group"], r["register"]): r["mr"]
        for r in df.select(F.col("role").alias("group"), reg, rho)
        .groupBy("group", "register")
        .agg(F.max("rho").alias("mr"))
        .collect()
    }
    assert got_regs == want_regs

    got_est = {
        r["group"]: r["approx_distinct"]
        for r in estimate_from_registers(snap).collect()
    }
    want_est = {
        r["role"]: r["approx_distinct"]
        for r in approx_distinct_hll(df, ["role"], "text").collect()
    }
    assert got_est == want_est  # bit-identical doubles


def test_streaming_cms_matches_batch(spark, tmp_path):
    df = _rows(spark)
    src = str(tmp_path / "in")
    df.where(F.col("doc_id") < 300).write.mode("overwrite").parquet(src)
    df.where(F.col("doc_id") >= 300).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_cms(stream, "text", width=64, depth=3)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("cmsstream")
        .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # counters only grow, so the final value per cell = max emitted
    snap = (
        spark.sql("SELECT * FROM cmsstream")
        .groupBy("d", "w")
        .agg(F.max("cnt").alias("cnt"))
    )
    got_cells = {(r["d"], r["w"]): r["cnt"] for r in snap.collect()}
    want_cells = {
        (r["d"], r["w"]): r["cnt"]
        for r in count_min_build(df, "text", width=64, depth=3).collect()
    }
    assert got_cells == want_cells

    queries = df.select("text").distinct().limit(5)
    got_est = {
        r["value"]: r["est"]
        for r in count_min_estimate(
            snap, queries, "text", width=64, depth=3
        ).collect()
    }
    want_est = {
        r["value"]: r["est"]
        for r in count_min_estimate(
            count_min_build(df, "text", width=64, depth=3),
            queries,
            "text",
            width=64,
            depth=3,
        ).collect()
    }
    assert got_est == want_est
