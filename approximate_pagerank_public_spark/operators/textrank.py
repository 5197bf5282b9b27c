"""TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
the corpus token co-occurrence graph.

A pure composition of the engine's existing primitives — the same
PageRank supersteps that rank transcript entities run unchanged over a
graph whose vertices are vocabulary tokens and whose edges are
adjacent-token co-occurrences — demonstrating the Graph/pagerank stack
is input-agnostic, exactly like running PGX over a different edge list.

Determinism across engines:
- token ids are the dense rank of the token string in sorted order
  (computed partition-parallel via ``etl.densify_vertices`` — no global
  window), identical to DuckDB ``dense_rank() OVER (ORDER BY token)``;
- edge weights are ``cnt / Σ_src cnt`` — two exact BIGINTs and ONE IEEE
  division, bit-identical in any engine;
- the iteration itself is the fixed-``iters`` power method whose
  association the unrolled-CTE oracle family already matches
  (``__spark_entry__._pagerank_fixed_oracle`` with this edge relation
  plugged in), stable6-truncated on both sides.

Scale shape: pair extraction is one per-doc window pass (state = one
row lookahead); the co-occurrence aggregate is map-side combinable with
shuffle volume = distinct pairs (vocabulary-sized, not corpus-sized);
everything downstream is the measured PageRank path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from approximate_pagerank_public_spark.plans.graph import Graph


def token_cooccurrence_edges(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(src_entity, dst_entity, cnt)`` — symmetric adjacent-token
    co-occurrence counts over the corpus tokenization convention
    (``split(lower(trim(text)), '\\s+')``). Self-pairs (repeated
    tokens) are dropped; both directions carry the same count."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    pos = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        pos.withColumn("nxt", F.lead("tok").over(w))
        .where(F.col("nxt").isNotNull() & (F.col("tok") != F.col("nxt")))
        .select(F.col("tok").alias("a"), F.col("nxt").alias("b"))
    )
    sym = pairs.unionAll(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
    return sym.groupBy(F.col("a").alias("src_entity"), F.col("b").alias("dst_entity")).agg(
        F.count("*").alias("cnt")
    )


def textrank_keywords(
    docs: DataFrame,
    topk: int = 20,
    iters: int = 8,
    alpha: float = 0.85,
    num_partitions: int = 16,
) -> DataFrame:
    """``(token, rank)`` — top-``topk`` corpus keywords by fixed-
    ``iters`` PageRank over the co-occurrence graph (α = 0.85, the
    TextRank paper's setting). Rank is stable6-truncated BEFORE the
    top-k cut; ties break to the smaller token string — both replayed
    by the oracle."""
    from approximate_pagerank_public_spark.operators.etl import densify_vertices
    from approximate_pagerank_public_spark.operators.pagerank import pagerank

    co = token_cooccurrence_edges(docs)
    verts = densify_vertices(co)  # (id, entity) — entity is the token
    n = verts.count()
    ids_src = verts.select(
        F.col("entity").alias("src_entity"), F.col("id").alias("src")
    )
    ids_dst = verts.select(
        F.col("entity").alias("dst_entity"), F.col("id").alias("dst")
    )
    srcsum = co.groupBy("src_entity").agg(F.sum("cnt").alias("ssum"))
    edges = (
        co.join(srcsum, "src_entity")
        .join(ids_src, "src_entity")
        .join(ids_dst, "dst_entity")
        .select(
            "src",
            "dst",
            (F.col("cnt").cast("double") / F.col("ssum").cast("double")).alias(
                "weight"
            ),
        )
    )
    g = Graph(edges, num_vertices=n, num_partitions=num_partitions)
    res = pagerank(g, alpha=alpha, tol=0.0, max_iter=iters)
    trunc = F.floor(F.col("rank") * F.lit(1000000.0)) / F.lit(1000000.0)
    out = (
        res.ranks()
        .join(verts, "id")
        .select(F.col("entity").alias("token"), trunc.alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("token").asc())
        .limit(int(topk))
    )
    return out
