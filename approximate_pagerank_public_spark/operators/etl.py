"""Transcript → edge-table ETL.

Derives the engine's native graph model (``vertices(id, entity)``,
``edges(src, dst, weight)``) from a transcript table, following
FIXTURES.md §2:

- **consecutive-turn link**: entity(turn i) → entity(turn i+1) within a
  conversation, ordered by ``turn_idx`` (``lag`` window — stable turn
  ordering invariant from ``BASELINE.json.input_hint``);
- **turn→tool link**: ``conv:<id>`` → ``tool:<t>`` for each tool turn;
- **role attribution**: ``role:<r>`` → ``conv:<id>`` for each role that
  appears in the conversation;

then self-loop removal + dedup (reference semantics: ``removeSelfloop``,
``src/common/utils/utils.hpp:399-446,599-608``), dense-rank entity → id
densification (reference: SNAP id remap,
``src/resources/python/convert_snap_to_mtx.py:38-60``), and out-degree
edge-weight normalization ``weight = 1/outdeg(src)`` (reference:
``src/common/utils/utils.hpp:886-895``).

The whole derivation is SQL-expressible; :data:`EDGES_SQL_TEMPLATE`
is the dialect-shared oracle text (DuckDB runs it verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# {SRC} = transcripts relation (table name or CTE). The CTE chain is
# shared between the edge and vertex-dictionary templates so the oracle
# derives both from the identical derivation text.
_GRAPH_CTES = """turns AS (
  SELECT conv_id, turn_idx,
         CASE WHEN role = 'tool' THEN 'tool:' || tool
              ELSE 'role:' || role END AS entity
  FROM {SRC}
),
consec AS (
  SELECT lag(entity) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS src_entity,
         entity AS dst_entity
  FROM turns
),
conv_tool AS (
  SELECT 'conv:' || conv_id AS src_entity, 'tool:' || tool AS dst_entity
  FROM {SRC} WHERE role = 'tool'
),
role_conv AS (
  SELECT DISTINCT 'role:' || role AS src_entity, 'conv:' || conv_id AS dst_entity
  FROM {SRC}
),
raw_edges AS (
  SELECT src_entity, dst_entity FROM consec WHERE src_entity IS NOT NULL
  UNION ALL SELECT src_entity, dst_entity FROM conv_tool
  UNION ALL SELECT src_entity, dst_entity FROM role_conv
),
dedup AS (
  SELECT DISTINCT src_entity, dst_entity FROM raw_edges
  WHERE src_entity <> dst_entity
),
verts AS (
  SELECT entity, dense_rank() OVER (ORDER BY entity) - 1 AS id
  FROM (SELECT src_entity AS entity FROM dedup
        UNION
        SELECT dst_entity AS entity FROM dedup) u
)"""

EDGES_SQL_TEMPLATE = (
    "\nWITH "
    + _GRAPH_CTES
    + """
SELECT vs.id AS src, vd.id AS dst,
       1.0 / CAST(count(*) OVER (PARTITION BY vs.id) AS DOUBLE) AS weight
FROM dedup e
JOIN verts vs ON e.src_entity = vs.entity
JOIN verts vd ON e.dst_entity = vd.entity
"""
)

# (id, entity) dictionary — same derivation, used by oracles that need
# entity names (e.g. the flagship top-20 PageRank query).
VERTICES_SQL_TEMPLATE = (
    "\nWITH " + _GRAPH_CTES + "\nSELECT id, entity FROM verts\n"
)


def turn_entity() -> F.Column:
    """Entity of a turn: its tool for tool turns, else its role."""
    return F.when(
        F.col("role") == "tool", F.concat(F.lit("tool:"), F.col("tool"))
    ).otherwise(F.concat(F.lit("role:"), F.col("role")))


def _raw_entity_edges(transcripts: DataFrame) -> DataFrame:
    """Directed entity-pair edges with duplicates and self-loops still
    in — every consumer dedups downstream, so no intermediate
    ``distinct`` (each would be its own full shuffle; the r2 ETL plan
    paid one for ``role_conv`` alone)."""
    turns = transcripts.select("conv_id", "turn_idx", turn_entity().alias("entity"))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    consec = turns.select(
        F.lag("entity").over(w).alias("src_entity"), F.col("entity").alias("dst_entity")
    ).where(F.col("src_entity").isNotNull())
    conv_tool = transcripts.where(F.col("role") == "tool").select(
        F.concat(F.lit("conv:"), F.col("conv_id")).alias("src_entity"),
        F.concat(F.lit("tool:"), F.col("tool")).alias("dst_entity"),
    )
    role_conv = transcripts.select(
        F.concat(F.lit("role:"), F.col("role")).alias("src_entity"),
        F.concat(F.lit("conv:"), F.col("conv_id")).alias("dst_entity"),
    )
    raw = consec.unionAll(conv_tool).unionAll(role_conv)
    return raw.where(F.col("src_entity") != F.col("dst_entity"))


def derive_entity_edges(transcripts: DataFrame) -> DataFrame:
    """Directed entity-pair edges (pre-densification), deduped and
    self-loop-free. Columns: ``src_entity, dst_entity``."""
    return _raw_entity_edges(transcripts).distinct()


def densify_vertices(entity_edges: DataFrame) -> DataFrame:
    """Dense int64 ids for entities: ``vertices(id, entity)`` — the id
    remap the reference does via ``id_to_id_map`` in
    ``convert_snap_to_mtx.py``. ``id`` = rank of ``entity`` in global
    sorted order (same result as ``dense_rank() OVER (ORDER BY
    entity)``, which is what the DuckDB oracle runs).

    Computed scalably: a global-sort window would funnel the whole
    dictionary through ONE partition, and at 10^12-turn scale the
    dictionary is ~|conversations| rows — far beyond a single task.
    Instead: range-repartition by entity (partition p's entities all
    sort before partition p+1's), per-partition ``row_number`` (window
    partitioned by ``spark_partition_id`` — fully parallel), plus
    driver-computed partition offsets (one tiny count job). The final
    ids are independent of where the (sampled, not perfectly
    deterministic) range boundaries land.
    """
    ents = (
        entity_edges.select(F.col("src_entity").alias("entity"))
        .union(entity_edges.select(F.col("dst_entity").alias("entity")))
        .distinct()
    )
    return dense_ids(ents, "entity")


def dense_ids(values: DataFrame, value_col: str) -> DataFrame:
    """``(id, <value_col>)`` — dense 0..N-1 ids in global sorted order
    over an already-DISTINCT value relation, without a global-sort
    window (see :func:`densify_vertices` for the scale rationale).
    Shared by the entity densifier and the SNAP edgelist remap."""
    spark = values.sparkSession
    p = max(1, spark.sparkContext.defaultParallelism)
    ranged = values.repartitionByRange(p, value_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    # localCheckpoint, not persist: a cache-evicted recompute could
    # re-SAMPLE different range boundaries and silently shift ids;
    # checkpointed blocks either exist or fail loudly
    ranged = ranged.localCheckpoint()
    counts = {r["_pid"]: r["count"] for r in ranged.groupBy("_pid").count().collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(value_col)
    out = (
        ranged.join(F.broadcast(off_df), "_pid")
        .select(
            (F.row_number().over(w) - 1 + F.col("_off")).cast("long").alias("id"),
            value_col,
        )
    )
    return out


# Above this vertex count the dictionary/out-degree lookups stop being
# broadcast-able (a 5M-entity dict is ~200 MB serialized — the practical
# broadcast ceiling) and the ETL falls back to shuffle joins + the
# src-window weight pass. Below it, dedup + the Graph's dst layout fuse
# into ONE full-|E| exchange and every join is map-side.
ETL_BROADCAST_MAX_VERTICES = 5_000_000


def build_edge_table(
    transcripts: DataFrame, layout_partitions: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Full ETL: transcripts → (vertices(id, entity), edges(src, dst, weight)).

    weight = 1/outdeg(src) over the deduped edge set (reference
    out-degree normalization, ``utils.hpp:886-895``); the reference does
    the whole load in one pass (``load_graph_mtx``, ``utils.hpp:850-899``)
    and this is the Spark analogue: the deduplication shuffle doubles as
    the Graph's pull-side layout.

    Physical plan (broadcast regime, |V| ≤ ETL_BROADCAST_MAX_VERTICES):

    1. raw edges → ``distinct`` (Catalyst plans a PARTIAL HashAggregate
       before its exchange, so the massive consecutive-turn duplicate
       mass — every role→role pair repeats ~|turns|/|role-pairs| times —
       collapses map-side; the exchange moves ~|E| deduped rows, never
       raw rows. Shuffling raw by dst first would concentrate half the
       raw stream in a hub entity's single partition at 10^12-turn
       scale);
    2. ``repartition(P, dst_entity)`` over the DEDUPED rows — hashing
       by dst ENTITY clusters identically to hashing by dst id, so this
       deduped-volume exchange IS the Graph's dst-disjoint layout
       (``Graph(layout_ready=True)`` skips its own repartition);
    3. id dictionary + out-degree joins are all broadcast (map-side, no
       shuffle, layout preserved).

    Beyond the threshold the id/outdeg lookups become shuffle joins and
    the weight reverts to a src-window pass — correctness-identical
    (tests pin both regimes), and ``Graph`` re-partitions explicitly
    since the joins destroyed the layout.
    """
    # cache: the deduped entity-edge set feeds three consumers (edge
    # output, out-degree agg, and the vertex-dictionary union); without
    # a persist Catalyst re-derives the whole window/union/dedup subtree
    # per consumer (verified via .explain)
    entity_edges = _raw_entity_edges(transcripts).distinct().persist()
    return edge_table_from_entity_edges(entity_edges, layout_partitions)


def edge_table_from_entity_edges(
    entity_edges: DataFrame, layout_partitions: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Entity-pair edges (already deduped, self-loop-free, persisted by
    the caller) → (vertices, edges) — the second half of
    :func:`build_edge_table`, exposed for consumers that maintain the
    entity-edge set themselves (the streaming PageRank maintenance sink
    accumulates it incrementally across micro-batches)."""
    spark = entity_edges.sparkSession
    p = layout_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    vertices = densify_vertices(entity_edges).persist()
    n = vertices.count()
    small = n <= ETL_BROADCAST_MAX_VERTICES
    src_map = vertices.select(
        F.col("entity").alias("src_entity"), F.col("id").alias("src")
    )
    dst_map = vertices.select(
        F.col("entity").alias("dst_entity"), F.col("id").alias("dst")
    )
    if small:
        outdeg = entity_edges.groupBy("src_entity").agg(
            F.count("*").alias("_outdeg")
        )
        edges = (
            entity_edges.repartition(p, "dst_entity")
            .join(F.broadcast(outdeg), "src_entity")
            .join(F.broadcast(src_map), "src_entity")
            .join(F.broadcast(dst_map), "dst_entity")
            .select(
                "src",
                "dst",
                (F.lit(1.0) / F.col("_outdeg").cast("double")).alias("weight"),
            )
        )
    else:
        e = (
            entity_edges.join(src_map, "src_entity")
            .join(dst_map, "dst_entity")
            .select("src", "dst")
        )
        wdeg = Window.partitionBy("src")
        edges = e.select(
            "src",
            "dst",
            (F.lit(1.0) / F.count("*").over(wdeg).cast("double")).alias("weight"),
        )
    return vertices, edges


def edge_layout_ready(num_vertices: int) -> bool:
    """Whether :func:`build_edge_table`'s output is already in the
    Graph's dst-disjoint hash layout (the broadcast regime preserved the
    dedup exchange's partitioning end-to-end)."""
    return num_vertices <= ETL_BROADCAST_MAX_VERTICES
