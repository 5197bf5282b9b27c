"""Structured Streaming ingest: transcripts stream → incremental edges.

The reference has no event-time streaming (its ``hls::stream`` is a
hardware FIFO — ``spmv_coo_multi_stream.hpp:89-104``), so streaming is
*additive* capability: a 10^12-turn transcript table is append-only in
practice, and the graph should absorb new turns without full rebuilds.

``stream_edges`` consumes a transcripts stream (file source in tests;
Kafka/Iceberg CDC in production), derives the same three edge rules as
the batch ETL (consecutive-turn linking uses
``applyInPandasWithState``-free logic: the per-conversation previous
entity is recovered by re-reading the *within-batch* window — late turns
beyond the watermark are dropped), and maintains incremental edge
counts per (src_entity, dst_entity) in the sink, from which weights are
re-derivable. Batch and stream share the entity derivation code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from approximate_pagerank_public_spark.operators.etl import turn_entity


def stream_edge_updates(transcripts_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming DataFrame of edge observations (src_entity, dst_entity).

    ``foreachBatch``-style consecutive-turn linking happens per
    micro-batch (turn pairs arriving in the same batch); conv→tool and
    role→conv rules are stateless projections. Returns the *union*
    stream ready for a counting sink:
    ``writeStream.outputMode("update")`` over
    ``groupBy(src_entity, dst_entity).count()``.
    """
    t = transcripts_stream.withWatermark("ts", watermark)
    conv_tool = t.where(F.col("role") == "tool").select(
        F.concat(F.lit("conv:"), F.col("conv_id")).alias("src_entity"),
        F.concat(F.lit("tool:"), F.col("tool")).alias("dst_entity"),
        "ts",
    )
    role_conv = t.select(
        F.concat(F.lit("role:"), F.col("role")).alias("src_entity"),
        F.concat(F.lit("conv:"), F.col("conv_id")).alias("dst_entity"),
        "ts",
    )
    return conv_tool.unionAll(role_conv)


def edge_count_query(edge_updates: DataFrame, checkpoint_dir: str, sink_path: str):
    """Windowed incremental edge-observation counts → parquet sink."""
    counts = edge_updates.groupBy(
        F.window("ts", "1 hour").alias("w"), "src_entity", "dst_entity"
    ).count()
    return (
        counts.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", sink_path)
    )


def consecutive_turn_edges_microbatch(batch_df: DataFrame) -> DataFrame:
    """Per-micro-batch consecutive-turn linking (use via ``foreachBatch``):
    identical window logic to the batch ETL, applied to the batch's rows."""
    turns = batch_df.select("conv_id", "turn_idx", turn_entity().alias("entity"))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return turns.select(
        F.lag("entity").over(w).alias("src_entity"),
        F.col("entity").alias("dst_entity"),
    ).where(F.col("src_entity").isNotNull())
