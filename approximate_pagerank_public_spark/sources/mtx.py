"""MatrixMarket / SNAP edgelist scans and sinks.

Reference users load ``.mtx`` graphs (``readMtxFast``,
``src/common/utils/utils.hpp:679-724``) and SNAP edgelists
(``convert_snap_to_mtx.py``), and export PGX edgelists
(``PageRank.writeGraph``, ``src/cpu/src/main/scala/PageRank.scala:60-78``).
These scans keep that surface: distributed text parse via
``spark.read.text`` + split (no driver-side parsing), with the loader
semantics of the reference — 1-based → 0-based ids, self-loops dropped
on read (``utils.hpp:599-608``), optional symmetrization, out-degree
weight normalization (``utils.hpp:886-895``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _normalize(df: DataFrame, undirect: bool, normalize: bool) -> DataFrame:
    df = df.where(F.col("src") != F.col("dst"))
    if undirect:
        df = df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        df = df.where(F.col("src") != F.col("dst"))
    df = df.distinct()
    if normalize:
        w = Window.partitionBy("src")
        df = df.select("src", "dst", (F.lit(1.0) / F.count("*").over(w)).alias("weight"))
    else:
        df = df.withColumn("weight", F.lit(1.0))
    return df


def read_mtx(
    spark: SparkSession, path: str, undirect: bool = False, normalize: bool = True
) -> DataFrame:
    """MatrixMarket coordinate scan → ``(src, dst, weight)``.

    Skips ``%`` comment lines and the size header (first non-comment
    line); converts 1-based ids to 0-based.
    """
    lines = spark.read.text(path).where(~F.col("value").startswith("%"))
    # the first non-comment line is the size header; file splits keep
    # byte order, so the minimum monotonically_increasing_id tags it
    tagged = lines.withColumn("_i", F.monotonically_increasing_id())
    first_i = tagged.agg(F.min("_i")).first()[0]
    body = tagged.where(F.col("_i") != first_i).select(
        F.split(F.trim("value"), r"\s+").alias("p")
    )
    edges = body.select(
        (F.element_at("p", 1).cast("long") - 1).alias("src"),
        (F.element_at("p", 2).cast("long") - 1).alias("dst"),
    )
    return _normalize(edges, undirect, normalize)


def read_snap_edgelist(
    spark: SparkSession,
    path: str,
    undirect: bool = False,
    normalize: bool = True,
    densify: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """SNAP tab/space edgelist scan → ``(edges, id_map)``.

    ``densify`` remaps arbitrary vertex ids to dense 0..N-1 via
    ``dense_rank`` (reference ``id_to_id_map``,
    ``convert_snap_to_mtx.py:38-60``); returns the mapping table.
    """
    lines = spark.read.text(path).where(
        ~F.col("value").startswith("#") & (F.trim("value") != "")
    )
    parts = lines.select(F.split(F.trim("value"), r"\s+").alias("p"))
    raw = parts.select(
        F.element_at("p", 1).cast("long").alias("src"),
        F.element_at("p", 2).cast("long").alias("dst"),
    )
    id_map = None
    if densify:
        from approximate_pagerank_public_spark.operators.etl import dense_ids

        ids = (
            raw.select(F.col("src").alias("orig"))
            .union(raw.select(F.col("dst").alias("orig")))
            .distinct()
        )
        # partition-parallel dense ranks (range partitions + per-
        # partition row_number + driver offsets) — a global-sort window
        # here would funnel the whole id dictionary through one task
        id_map = dense_ids(ids, "orig").select("orig", "id")
        m = F.broadcast(id_map)
        raw = (
            raw.join(m.withColumnRenamed("orig", "src").withColumnRenamed("id", "s2"), "src")
            .join(m.withColumnRenamed("orig", "dst").withColumnRenamed("id", "d2"), "dst")
            .select(F.col("s2").alias("src"), F.col("d2").alias("dst"))
        )
    return _normalize(raw, undirect, normalize), id_map


def write_edgelist(edges: DataFrame, path: str, sep: str = " ") -> None:
    """PGX-style edgelist sink: one ``src<sep>dst<sep>weight`` line per
    edge (text, distributed write)."""
    edges.select(
        F.concat_ws(sep, F.col("src"), F.col("dst"), F.col("weight")).alias("value")
    ).write.mode("overwrite").text(path)
