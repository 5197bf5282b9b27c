"""Similarity search over an embedding column (``array<float>``).

- :func:`cosine_topk_bruteforce` — exact top-k neighbors per query via a
  cross join + ``F.zip_with``/``F.aggregate`` dot products (JVM-side
  expressions; correct baseline, O(Q×N)).
- :func:`lsh_ann_topk` — the scale path: random-hyperplane LSH
  bucketing; candidates are pairs sharing a bucket in any of ``tables``
  hash tables, then exact cosine re-rank within candidates. Shuffle is
  O(N × tables) bucket rows instead of O(Q×N) pairs.

The hyperplanes are deterministic (seeded NumPy), broadcast as literal
arrays into the plan — no UDFs; the dot products run in codegen.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: str | F.Column, b: str | F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: str | F.Column) -> F.Column:
    return F.sqrt(_dot(a, a))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    return df.withColumn(
        out,
        (_dot(a, b) / (_norm(a) * _norm(b))).cast("double"),
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """``(query_id, vec_id, cosine, rank)`` — exact top-k per query.

    The corpus side stays partitioned; the (small) query side is
    broadcast, so the cross join never shuffles the corpus.
    """
    j = embeddings.crossJoin(F.broadcast(queries))
    scored = with_cosine(j, vec_col, query_vec_col)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, bits: int, table: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed + 1000 * table)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_bucket(
    df: DataFrame, vec_col: str, dim: int, bits: int, table: int, seed: int
) -> F.Column:
    """Signed-random-projection bucket id (int) for one hash table."""
    planes = _hyperplanes(dim, bits, table, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec_col, plane) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank within LSH candidates."""
    corpus_buckets = embeddings.select(
        id_col,
        vec_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket(embeddings, vec_col, dim, bits, t, seed).alias("bucket"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("tb"),
    ).select(id_col, vec_col, "tb.tbl", "tb.bucket")
    query_buckets = queries.select(
        query_id_col,
        query_vec_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket(queries, query_vec_col, dim, bits, t, seed).alias("bucket"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("tb"),
    ).select(query_id_col, query_vec_col, "tb.tbl", "tb.bucket")
    cands = (
        corpus_buckets.join(F.broadcast(query_buckets), ["tbl", "bucket"])
        .select(query_id_col, query_vec_col, id_col, vec_col)
        .dropDuplicates([query_id_col, id_col])
    )
    scored = with_cosine(cands, vec_col, query_vec_col)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
