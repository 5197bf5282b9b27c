"""Deterministic synthesizers for the documents / events table shapes.

The driver testdata ships parquet only at sf ≤ 0.1; the sf1+ scaling
campaigns (BASELINE.md) still need the text-curation and event operators
measured at a 10× data step. These generators reproduce the testdata
schemas exactly and derive every value from ``xxhash64(id, seed, salt)``
— fully distributed, no RNG state, identical output for the same
``(n, seed)`` at any partitioning or cluster size (same contract as
``transcripts.synthesize_transcripts``).

Shape fidelity that matters to the operators under test:

- ``documents(doc_id, text, lang, source, n_chars)`` — text is a
  20-160-token sequence over a ~200-word vocabulary; ~8% of docs are
  REPLICAS of a lower-id doc (same token stream ⇒ exact and near-dup
  work for the dedup family), and a boilerplate sentence is prepended to
  ~25% (shared shingles ⇒ contamination/minhash banding has real load).
- ``events(event_id, ts, user_id, event_type, value, props)`` — Zipfish
  user skew (hot sessionization keys), 5 event types, timestamps spread
  over ~n/1000 hours so sessions have realistic gaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BASE_EPOCH = 1704067200  # 2024-01-01 UTC, same base as the testdata

_EVENT_TYPES = ("view", "click", "purchase", "error", "login")


def synthesize_documents(
    spark: SparkSession,
    n_docs: int = 5000,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    d = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    h = lambda salt: F.xxhash64(F.col("orig"), F.lit(seed), F.lit(salt))  # noqa: E731
    # ~8% replicas: doc i duplicates doc i - (i % 13 + 1) when h0 % 12 == 0
    h0 = F.xxhash64(F.col("id"), F.lit(seed), F.lit(0))
    d = d.select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.pmod(h0, F.lit(12)) == 0) & (F.col("id") >= 13),
            F.col("id") - (F.pmod(h0, F.lit(13)) + 1),
        )
        .otherwise(F.col("id"))
        .alias("orig"),
    )
    n_toks = (F.lit(20) + F.pmod(h(1), F.lit(141))).cast("int")
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), n_toks - 1),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("orig"), i, F.lit(seed), F.lit(2)), F.lit(199)),
            ),
        ),
    )
    text = F.when(
        F.pmod(h(3), F.lit(4)) == 0,
        F.concat(F.lit("terms of service apply to all content here "), body),
    ).otherwise(body)
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("de"), F.lit("fr")),
        (F.pmod(h(4), F.lit(5)) + 1).cast("int"),
    )
    source = F.concat(F.lit("crawl_"), F.pmod(h(5), F.lit(8)))
    return d.select(
        "doc_id",
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def synthesize_events(
    spark: SparkSession,
    n_events: int = 100_000,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    e = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    h = lambda salt: F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt))  # noqa: E731
    # cube-law user skew over ~n/50 users: user 0 is the hot key
    u = F.pmod(h(1), F.lit(1000)) / F.lit(1000.0)
    n_users = max(2, n_events // 50)
    user_id = F.floor(F.pow(u, F.lit(3.0)) * F.lit(n_users)).cast("long")
    etype = F.element_at(
        F.array(*[F.lit(t) for t in _EVENT_TYPES]),
        (F.pmod(h(2), F.lit(len(_EVENT_TYPES))) + 1).cast("int"),
    )
    return e.select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(_BASE_EPOCH)
            + F.col("id") * F.lit(3.6)
            + F.pmod(h(3), F.lit(1800)) / F.lit(10.0)
        ).cast("timestamp_ntz").alias("ts"),
        user_id.alias("user_id"),
        etype.alias("event_type"),
        (F.pmod(h(4), F.lit(20000)) / F.lit(100.0)).alias("value"),
        F.concat(F.lit('{"k": '), F.pmod(h(5), F.lit(100)), F.lit("}")).alias("props"),
    )


def synthesize_embeddings(
    spark: SparkSession,
    n_vecs: int = 2000,
    dim: int = 64,
    n_anchors: int = 8,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """``(vec_id, embedding: array<float>)`` matching the testdata
    embeddings schema, for the ANN/PQ 10x scaling campaigns.

    Fully codegen (xxhash64-derived, no RNG state): every vector is one
    of ``n_anchors`` deterministic anchor directions plus per-component
    hash noise — so k-means/IVF/PQ quantizers see real cluster
    structure, not uniform dust — and ~5% of vectors replicate a lower
    id exactly (near-dup load for the dedup family)."""
    d = spark.range(
        0, n_vecs, 1, partitions or spark.sparkContext.defaultParallelism
    )
    h0 = F.xxhash64(F.col("id"), F.lit(seed), F.lit(100))
    d = d.select(
        F.col("id").alias("vec_id"),
        F.when(
            (F.pmod(h0, F.lit(20)) == 0) & (F.col("id") >= 7),
            F.col("id") - (F.pmod(h0, F.lit(7)) + 1),
        )
        .otherwise(F.col("id"))
        .alias("orig"),
    )
    anchor = F.pmod(F.xxhash64(F.col("orig"), F.lit(seed), F.lit(101)), F.lit(n_anchors))

    def comp(i):
        base = (
            F.pmod(F.xxhash64(anchor, i, F.lit(seed), F.lit(102)), F.lit(2001))
            - F.lit(1000)
        ).cast("double") / F.lit(1000.0)
        noise = (
            F.pmod(
                F.xxhash64(F.col("orig"), i, F.lit(seed), F.lit(103)),
                F.lit(2001),
            )
            - F.lit(1000)
        ).cast("double") / F.lit(1000.0)
        return (base + F.lit(0.3) * noise).cast("float")

    vec = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), comp)
    # label = the anchor id (the testdata's label column is a cluster
    # label; here the anchor IS the ground-truth cluster)
    return d.select(
        "vec_id", vec.alias("embedding"), anchor.cast("int").alias("label")
    )
