"""Neighborhood feature aggregation (GraphSAGE-style mean aggregate).

The training-data-pipeline primitive behind GNN feature propagation: for
each vertex, the element-wise MEAN of its in-neighbors' feature vectors
— one hop of ``H' = D⁻¹ Aᵀ H``. This is the dense-feature sibling of the
rank SpMV the engine is built around (``operators/spmv.py``): same pull
orientation, same dst-hash layout, but the payload is a d-dimensional
vector per vertex instead of a scalar.

Physical shape: the feature table joins the edge table on ``src`` (AQE
broadcasts it while it fits; it degrades to a shuffle-hash join keyed on
src beyond that), features are exploded to ``(dst, dim, val)`` long form
with ``posexplode`` — Catalyst's generator, not Python — and the
per-(dst, dim) mean is one hash aggregate whose partial step runs
map-side. Long-form output keeps the whole plan in whole-stage codegen
(no array re-assembly) and shuffles O(|E|·d) slim rows; for the 100-TB
regime with large d, the same aggregation can run per-dimension-range by
filtering ``dim`` — embarrassingly parallel across feature slices.

Float note: per-group sums accumulate in engine-specific order, exactly
like the per-dst rank sums in ``operators/pagerank.py``'s oracle — the
6-dp truncation both engines apply absorbs the ~1e-15 association
differences (float32 inputs widen to exact doubles first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def neighbor_mean_features(
    edges: DataFrame,
    features: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean of in-neighbor features per vertex, long form:
    ``(id, dim, nbr_mean, deg)`` — one row per (vertex, dimension), only
    for vertices with ≥1 in-neighbor carrying features.

    ``edges(src, dst)`` use vertex ids; ``features`` maps ``id_col`` →
    ``vec_col`` (array<float>). A vertex whose id has no feature row
    contributes nothing (outer semantics are the caller's composition).
    """
    feats = features.select(
        F.col(id_col).alias("src"), F.col(vec_col).alias("_vec")
    )
    joined = edges.select("src", "dst").join(feats, "src")
    long = joined.select(
        "dst", F.posexplode("_vec").alias("dim", "_val")
    ).select("dst", "dim", F.col("_val").cast("double").alias("_val"))
    agg = long.groupBy("dst", "dim").agg(
        F.sum("_val").alias("_sum"), F.count("*").alias("deg")
    )
    return agg.select(
        F.col("dst").alias("id"),
        "dim",
        (F.col("_sum") / F.col("deg").cast("double")).alias("nbr_mean"),
        "deg",
    )


def neighbor_mean_modulo(
    graph,
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Convenience wiring for the test tables: vertex ``v`` gets the
    feature row ``vec_id = v % n_vecs`` (a deterministic id fold so every
    vertex has a feature at any graph/embedding size ratio), then one
    mean-aggregate hop over the graph's edges."""
    n_vecs = embeddings.count()
    feats = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
    src_feats = (
        graph.edges.select("src")
        .distinct()
        .withColumn("vec_id", F.col("src") % F.lit(n_vecs))
        .join(feats, "vec_id")
        .select("src", vec_col)
    )
    return neighbor_mean_features(
        graph.edges, src_feats, id_col="src", vec_col=vec_col
    )


# DuckDB oracle ({EDGES} = edge relation SQL, {EMB} = embeddings parquet
# path, {DIM} = feature dimensionality): element indexing replaces the
# explode — dims is a tiny unnested range, embedding[i+1] is DuckDB's
# 1-based list index; CAST to DOUBLE before summing matches Spark's
# float→double widening exactly.
NEIGHBOR_MEAN_SQL_TEMPLATE = """
WITH e AS MATERIALIZED ({EDGES}),
nv AS (SELECT count(*) AS n FROM read_parquet('{EMB}')),
srcs AS (SELECT DISTINCT src FROM e),
feats AS (
  SELECT s.src, emb.embedding
  FROM srcs s
  JOIN read_parquet('{EMB}') emb
    ON emb.vec_id = s.src % (SELECT n FROM nv)
),
dims AS (SELECT unnest(range({DIM})) AS dim),
long AS (
  SELECT e.dst, d.dim,
         CAST(f.embedding[d.dim + 1] AS DOUBLE) AS val
  FROM e JOIN feats f ON f.src = e.src CROSS JOIN dims d
)
SELECT dst AS id, dim,
       sum(val) / CAST(count(*) AS DOUBLE) AS nbr_mean,
       count(*) AS deg
FROM long GROUP BY dst, dim
"""
