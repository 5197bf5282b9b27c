"""Temporal (recency-decayed) edge weights and PageRank.

The transcript tables carry per-turn timestamps; link-graph consumers
routinely want rankings that discount stale links (a tool last touched a
year ago should pull less rank than one used today). This module derives
the SAME entity-edge set as ``operators/etl.py`` but keeps, per deduped
edge, the timestamp of its most recent occurrence, and weights the edge

    weight(src→dst) = decay(age) / outdeg(src),
    decay(age) = 1 / (1 + age_days),  age_days = (max_ts − ets) // 1 day

computed entirely in exact integer arithmetic plus two correctly-rounded
IEEE divisions, so the DuckDB oracle reproduces every weight
bit-for-bit (the same discipline as the 1/outdeg weights in
``operators/etl.py``; reference out-degree normalization:
``src/common/utils/utils.hpp:886-895``). The resulting transition matrix
is column-substochastic — old edges deliberately leak rank mass to the
teleport term — which keeps the weight free of a per-src float
normalization sum whose summation order would differ between engines.

Plan shape (mirrors ``build_edge_table``'s two-exchange layout): the raw
occurrence stream is reduced by a ``groupBy(src,dst).max(ets)`` whose
partial aggregate collapses the duplicate mass map-side (the temporal
analogue of the ETL's ``distinct()``-first invariant), then ONE
``repartition(P, dst_entity)`` over deduped rows doubles as the Graph's
pull-side layout; the id/out-degree lookups are broadcast below
``ETL_BROADCAST_MAX_VERTICES`` and shuffle joins above it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from approximate_pagerank_public_spark.operators.etl import (
    ETL_BROADCAST_MAX_VERTICES,
    densify_vertices,
    turn_entity,
)

MICROS_PER_DAY = 86_400_000_000

# DuckDB oracle text: identical derivation (epoch_us == unix_micros,
# BIGINT `//` == Spark `div` — both exact integer ops; the two divisions
# are single IEEE ops). {SRC} = transcripts relation.
DECAYED_EDGES_SQL_TEMPLATE = """
WITH turns AS (
  SELECT conv_id, turn_idx, ts,
         CASE WHEN role = 'tool' THEN 'tool:' || tool
              ELSE 'role:' || role END AS entity
  FROM {SRC}
),
consec AS (
  SELECT lag(entity) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS src_entity,
         entity AS dst_entity, ts
  FROM turns
),
conv_tool AS (
  SELECT 'conv:' || conv_id AS src_entity, 'tool:' || tool AS dst_entity, ts
  FROM {SRC} WHERE role = 'tool'
),
role_conv AS (
  SELECT 'role:' || role AS src_entity, 'conv:' || conv_id AS dst_entity, ts
  FROM {SRC}
),
raw_edges AS (
  SELECT src_entity, dst_entity, ts FROM consec WHERE src_entity IS NOT NULL
  UNION ALL SELECT src_entity, dst_entity, ts FROM conv_tool
  UNION ALL SELECT src_entity, dst_entity, ts FROM role_conv
),
tedges AS (
  SELECT src_entity, dst_entity, max(epoch_us(ts)) AS ets
  FROM raw_edges WHERE src_entity <> dst_entity
  GROUP BY src_entity, dst_entity
),
mx AS (SELECT max(ets) AS m FROM tedges),
verts AS (
  SELECT entity, dense_rank() OVER (ORDER BY entity) - 1 AS id
  FROM (SELECT src_entity AS entity FROM tedges
        UNION
        SELECT dst_entity AS entity FROM tedges) u
),
deg AS (
  SELECT src_entity, count(*) AS outdeg FROM tedges GROUP BY src_entity
)
SELECT vs.id AS src, vd.id AS dst,
       (1.0 / (1.0 + CAST(((SELECT m FROM mx) - e.ets) // {MPD} AS DOUBLE)))
         / CAST(deg.outdeg AS DOUBLE) AS weight
FROM tedges e
JOIN verts vs ON e.src_entity = vs.entity
JOIN verts vd ON e.dst_entity = vd.entity
JOIN deg ON e.src_entity = deg.src_entity
""".replace(
    "{MPD}", str(MICROS_PER_DAY)
)


def decayed_entity_edges(transcripts: DataFrame) -> DataFrame:
    """Deduped entity edges with the max occurrence timestamp:
    ``(src_entity, dst_entity, ets)`` — ets in epoch MICROseconds
    (exact int64, so age bucketing is engine-independent)."""
    turns = transcripts.select(
        "conv_id", "turn_idx", "ts", turn_entity().alias("entity")
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    consec = turns.select(
        F.lag("entity").over(w).alias("src_entity"),
        F.col("entity").alias("dst_entity"),
        "ts",
    ).where(F.col("src_entity").isNotNull())
    conv_tool = transcripts.where(F.col("role") == "tool").select(
        F.concat(F.lit("conv:"), F.col("conv_id")).alias("src_entity"),
        F.concat(F.lit("tool:"), F.col("tool")).alias("dst_entity"),
        "ts",
    )
    role_conv = transcripts.select(
        F.concat(F.lit("role:"), F.col("role")).alias("src_entity"),
        F.concat(F.lit("conv:"), F.col("conv_id")).alias("dst_entity"),
        "ts",
    )
    raw = consec.unionAll(conv_tool).unionAll(role_conv)
    # no intermediate distinct — the max() agg both dedups and picks the
    # freshest occurrence, and its PARTIAL aggregate runs map-side.
    # ts arrives TIMESTAMP_NTZ from parquet; the session tz is pinned to
    # UTC (session.py), so cast→unix_micros equals DuckDB's epoch_us on
    # the same naive value.
    return (
        raw.where(F.col("src_entity") != F.col("dst_entity"))
        .select(
            "src_entity",
            "dst_entity",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ets"),
        )
        .groupBy("src_entity", "dst_entity")
        .agg(F.max("ets").alias("ets"))
    )


def build_decayed_edge_table(
    transcripts: DataFrame, layout_partitions: int | None = None
) -> tuple[DataFrame, DataFrame, bool]:
    """Transcripts → ``(vertices(id, entity), edges(src, dst, weight),
    layout_ready)`` with recency-decayed weights (module docstring).

    The vertex id space is IDENTICAL to ``build_edge_table``'s (same
    deduped edge set, same dense rank), so decayed ranks are directly
    comparable with the uniform-weight ranks.
    """
    spark = transcripts.sparkSession
    p = layout_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    tedges = decayed_entity_edges(transcripts).persist()
    vertices = densify_vertices(
        tedges.select("src_entity", "dst_entity")
    ).persist()
    n = vertices.count()
    small = n <= ETL_BROADCAST_MAX_VERTICES
    # one driver scalar: the global freshest timestamp (partial-agged scan)
    mx = tedges.agg(F.max("ets")).first()[0]
    age_days = F.expr(f"({mx}L - ets) div {MICROS_PER_DAY}L")
    decay = F.lit(1.0) / (F.lit(1.0) + age_days.cast("double"))
    src_map = vertices.select(
        F.col("entity").alias("src_entity"), F.col("id").alias("src")
    )
    dst_map = vertices.select(
        F.col("entity").alias("dst_entity"), F.col("id").alias("dst")
    )
    if small:
        outdeg = tedges.groupBy("src_entity").agg(F.count("*").alias("_outdeg"))
        edges = (
            tedges.repartition(p, "dst_entity")
            .join(F.broadcast(outdeg), "src_entity")
            .join(F.broadcast(src_map), "src_entity")
            .join(F.broadcast(dst_map), "dst_entity")
            .select(
                "src",
                "dst",
                (decay / F.col("_outdeg").cast("double")).alias("weight"),
            )
        )
    else:
        e = (
            tedges.join(src_map, "src_entity")
            .join(dst_map, "dst_entity")
            .select("src", "dst", "ets")
        )
        wdeg = Window.partitionBy("src")
        edges = e.select(
            "src",
            "dst",
            (decay / F.count("*").over(wdeg).cast("double")).alias("weight"),
        )
    return vertices, edges, small


def decayed_graph(transcripts: DataFrame, num_partitions: int | None = None):
    """Graph with recency-decayed, out-degree-normalized weights."""
    from approximate_pagerank_public_spark.plans.graph import Graph

    spark = transcripts.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    vertices, edges, layout_ready = build_decayed_edge_table(
        transcripts, layout_partitions=p
    )
    return Graph(
        edges,
        num_vertices=vertices.count(),
        num_partitions=p,
        vertices=vertices,
        layout_ready=layout_ready,
    )
