"""Transcript table sources.

The engine's primary input is an Iceberg-style table of multi-turn
conversation / agent transcripts with columns
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)`` and the **stable turn ordering** invariant:
``turn_idx`` is contiguous and unique per ``conv_id``, consistent with
``ts``.

Two sources are provided:

1. :func:`synthesize_transcripts` — a fully distributed deterministic
   generator (``spark.range`` + hash arithmetic; no driver-side data,
   no wall-clock randomness) used for unit tests and bench-scale graphs.
   This plays the role of the reference's NetworkX graph generators
   (``src/resources/python/graph_generator/generate_graph.py:59-106``),
   including Zipf-ish tool skew so hub-vertex handling is exercised.

2. :func:`transcripts_from_events` — a deterministic derivation of the
   transcript shape from the driver-provided ``events`` table. Its
   semantics are captured by :data:`TRANSCRIPTS_FROM_EVENTS_TEMPLATE`,
   a dialect-parameterized SQL template that DuckDB can run verbatim,
   so the whole transcript ETL is oracle-checkable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Dialect-shared SQL. `{STR}` is STRING for Spark, VARCHAR for DuckDB;
# `{SRC}` is the events relation name. Everything else is common ANSI.
TRANSCRIPTS_FROM_EVENTS_TEMPLATE = """
SELECT
  'conv_' || lpad(CAST(user_id AS {STR}), 8, '0')                  AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
       AS INTEGER)                                                 AS turn_idx,
  CASE WHEN event_id % 10 < 4 THEN 'user'
       WHEN event_id % 10 < 8 THEN 'assistant'
       WHEN event_id % 10 = 8 THEN 'system'
       ELSE 'tool' END                                             AS role,
  'tok' || CAST(event_id % 97 AS {STR}) ||
  ' tok' || CAST(user_id % 53 AS {STR}) ||
  ' tok' || CAST(event_id % 31 AS {STR})                           AS text,
  CASE WHEN event_id % 10 = 9 THEN 'tool_' || lower(event_type)
       ELSE NULL END                                               AS tool,
  ts
FROM {SRC}
"""


def transcripts_from_events_sql(dialect: str, src: str = "events") -> str:
    str_type = {"spark": "STRING", "duckdb": "VARCHAR"}[dialect]
    return TRANSCRIPTS_FROM_EVENTS_TEMPLATE.format(STR=str_type, SRC=src)


def transcripts_from_events(events: DataFrame) -> DataFrame:
    """DataFrame-API twin of :data:`TRANSCRIPTS_FROM_EVENTS_TEMPLATE`.

    ``row_number`` is ordered by ``(ts, event_id)`` so the turn order is
    total and deterministic (stable turn ordering invariant).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    m = F.col("event_id") % 10
    return events.select(
        F.concat(F.lit("conv_"), F.lpad(F.col("user_id").cast("string"), 8, "0")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.when(m < 4, "user")
        .when(m < 8, "assistant")
        .when(m == 8, "system")
        .otherwise("tool")
        .alias("role"),
        F.concat(
            F.lit("tok"), (F.col("event_id") % 97).cast("string"),
            F.lit(" tok"), (F.col("user_id") % 53).cast("string"),
            F.lit(" tok"), (F.col("event_id") % 31).cast("string"),
        ).alias("text"),
        F.when(m == 9, F.concat(F.lit("tool_"), F.lower("event_type"))).alias("tool"),
        F.col("ts"),
    )


# base epoch for synthetic timestamps: 2024-01-01T00:00:00Z
_BASE_EPOCH = 1704067200
_N_TOOLS = 32


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int = 2000,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic, fully distributed transcript generator.

    Per conversation ``c``: turns-per-conv in ``[4, 28]`` (mean ~16,
    mirroring FIXTURES.md), roles drawn from a fixed categorical
    (user/assistant dominate), tool turns pick ``tool_k`` with a
    Zipf-ish cube-law skew over 32 tools (``tool_0`` is a mega-hub —
    the skew-splitting stress case), text is a deterministic token
    sequence keyed by ``(seed, conv, turn)``.

    Everything derives from ``xxhash64`` of ``(id, turn, seed)`` —
    stable across Spark versions/partitionings, no RNG state, so the
    same ``(n_convs, seed)`` always yields the identical table even when
    generated on a different cluster size.
    """
    convs = spark.range(0, n_convs, 1, partitions or spark.sparkContext.defaultParallelism)
    convs = convs.select(
        F.col("id").alias("conv_n"),
        (F.lit(4) + F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(0)), F.lit(25))).alias(
            "n_turns"
        ),
    )
    t = convs.select(
        "conv_n",
        F.explode(F.sequence(F.lit(0), (F.col("n_turns") - 1).cast("int"))).alias("turn_idx"),
    )
    h1 = F.xxhash64("conv_n", "turn_idx", F.lit(seed), F.lit(1))
    h2 = F.xxhash64("conv_n", "turn_idx", F.lit(seed), F.lit(2))
    h3 = F.xxhash64("conv_n", "turn_idx", F.lit(seed), F.lit(3))
    r = F.pmod(h1, F.lit(10))
    # cube-law skew: u^3 concentrates mass near tool_0
    u = F.pmod(h2, F.lit(1000)) / F.lit(1000.0)
    tool_k = F.floor(F.pow(u, F.lit(3.0)) * _N_TOOLS).cast("int")
    role = (
        F.when(F.col("turn_idx") == 0, "user")
        .when(r < 4, "user")
        .when(r < 8, "assistant")
        .when(r == 8, "system")
        .otherwise("tool")
    )
    return t.select(
        F.concat(F.lit("conv_"), F.lpad(F.col("conv_n").cast("string"), 8, "0")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat(
            F.lit("tok"), F.pmod(h3, F.lit(97)).cast("string"),
            F.lit(" tok"), F.pmod(h3, F.lit(53)).cast("string"),
            F.lit(" tok"), F.pmod(h3, F.lit(31)).cast("string"),
            F.lit(" tok"), F.pmod(h3, F.lit(13)).cast("string"),
        ).alias("text"),
        F.when(role == "tool", F.concat(F.lit("tool_"), tool_k.cast("string"))).alias("tool"),
        F.timestamp_seconds(
            F.lit(_BASE_EPOCH) + F.col("conv_n") * 3600 + F.col("turn_idx") * 30
        ).alias("ts"),
    )
