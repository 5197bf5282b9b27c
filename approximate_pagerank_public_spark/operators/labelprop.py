"""Synchronous label propagation (community detection).

North-rule algorithm built on the same superstep machinery: per
iteration each vertex adopts the label with the greatest incoming
weight among its (symmetrized) neighbors, ties broken by the **smallest
label** so the algorithm is fully deterministic (classic async LPA is
randomized; a deterministic synchronous variant is required for golden
parity testing).

One implementation serves both scales: the per-(dst,label) weight
aggregation is a DataFrame ``groupBy(dst, label).sum`` with map-side
partial aggregation, and the argmax is a window over each dst group —
all JVM-side, no Python in the loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from approximate_pagerank_public_spark.plans.graph import Graph


def label_propagation(graph: Graph, max_iter: int = 10) -> DataFrame:
    """``(id, label)`` after ``max_iter`` synchronous rounds (early-stops
    on a fixpoint)."""
    und = graph.undirected()
    spark = graph.spark
    p = graph.num_partitions
    labels = und.vertices.withColumn("label", F.col("id"))
    labels = labels.repartition(p, "id").localCheckpoint()
    try:
        for _ in range(max_iter):
            votes = (
                und.edges.join(
                    labels.select(F.col("id").alias("src"), F.col("label")), "src"
                )
                .groupBy("dst", "label")
                .agg(F.sum("weight").alias("w"))
            )
            w = Window.partitionBy("dst").orderBy(F.col("w").desc(), F.col("label").asc())
            best = (
                votes.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .select(F.col("dst").alias("id"), F.col("label").alias("new_label"))
            )
            new = (
                labels.join(best, "id", "left")
                .select("id", F.coalesce("new_label", "label").alias("label"))
                .repartition(p, "id")
                .localCheckpoint()
            )
            changed = (
                new.join(labels.withColumnRenamed("label", "_old"), "id")
                .where(F.col("label") != F.col("_old"))
                .count()
            )
            labels.unpersist()
            labels = new
            if changed == 0:
                break
        return labels
    finally:
        und.unpersist()


def golden_label_propagation(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, n: int, max_iter: int = 10
) -> np.ndarray:
    """NumPy twin of :func:`label_propagation` (symmetrized input edges
    expected, i.e. pass both directions)."""
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_iter):
        votes: dict[tuple[int, int], float] = {}
        for u, v, wt in zip(src.tolist(), dst.tolist(), w.tolist()):
            key = (v, int(labels[u]))
            votes[key] = votes.get(key, 0.0) + wt
        new = labels.copy()
        best: dict[int, tuple[float, int]] = {}
        for (v, lbl), wt in votes.items():
            cur = best.get(v)
            # max weight, tie → min label
            if cur is None or (wt, -lbl) > (cur[0], -cur[1]):
                best[v] = (wt, lbl)
        for v, (_, lbl) in best.items():
            new[v] = lbl
        if np.array_equal(new, labels):
            return labels
        labels = new
    return labels
