"""BFS-family algorithms: level-synchronous BFS, multi-source BFS,
filtered BFS, closeness centrality, eccentricity.

Reference semantics (PGX Green-Marl CPU baselines):

- ``bfs.gm:1-14`` — level-synchronous BFS, ``dist=+INF`` init, each
  frontier level stamps ``dist = level``.
- ``bfs2.gm:1-16`` — sequential multi-source BFS.
- ``fbfs.gm:1-19`` — BFS with a vertex predicate hook.
- ``cc.gm:1-28`` — **closeness centrality**: per source,
  ``1 / Σ(levels)``; 0 for sources that do not reach the whole graph
  (disconnected detection).
- ``eccentricity.gm:1-30`` — per source max BFS level; graph diameter =
  max, radius = min.

Spark strategy: iterative frontier joins. The frontier is a DataFrame
``(id)``; each level expands via an equi-join with the edge table and an
anti-join against visited — both shuffle on vertex id and reuse the
graph's dst-hash partitioning. Multi-source runs carry a ``source``
column so S BFS traversals advance in one join per level (batched, like
the multi-PPR block).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from approximate_pagerank_public_spark.plans.graph import Graph


def bfs(
    graph: Graph,
    source: int,
    max_levels: int = 10_000,
    vertex_filter: Column | None = None,
) -> DataFrame:
    """``(id, dist)`` for vertices reachable from ``source``.

    ``vertex_filter`` (a boolean Column over ``id``) restricts which
    vertices may be visited — the ``fbfs`` predicate hook.
    """
    res = multi_source_bfs(graph, [source], max_levels, vertex_filter)
    return res.select("id", "dist")


def multi_source_bfs(
    graph: Graph,
    sources: list[int],
    max_levels: int = 10_000,
    vertex_filter: Column | None = None,
) -> DataFrame:
    """``(source, id, dist)`` — S traversals batched per level."""
    spark = graph.spark
    p = graph.num_partitions
    import pandas as pd

    seed = spark.createDataFrame(
        pd.DataFrame({"source": sources, "id": sources})
    ).withColumn("dist", F.lit(0))
    visited = seed.repartition(p, "id").persist(StorageLevel.MEMORY_AND_DISK)
    visited.count()
    frontier = visited
    level = 0
    while level < max_levels:
        level += 1
        nxt = (
            frontier.join(
                graph.edges.select(F.col("src").alias("id"), "dst"), "id"
            )
            .select("source", F.col("dst").alias("id"))
            .distinct()
        )
        if vertex_filter is not None:
            nxt = nxt.where(vertex_filter)
        nxt = (
            nxt.join(visited.select("source", "id"), ["source", "id"], "left_anti")
            .withColumn("dist", F.lit(level))
            .repartition(p, "id")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        if nxt.count() == 0:
            nxt.unpersist()
            break
        new_visited = visited.unionAll(nxt).repartition(p, "id").localCheckpoint()
        if frontier is not visited:
            frontier.unpersist()
        visited.unpersist()
        visited = new_visited
        frontier = nxt
    return visited


def closeness_centrality(graph: Graph, sources: list[int]) -> DataFrame:
    """``(source, closeness)``: ``1/Σ dist`` over reached vertices; 0 when
    the source reaches nothing (matches ``cc.gm`` disconnected handling)."""
    dists = multi_source_bfs(graph, sources)
    return dists.groupBy("source").agg(
        F.when(F.sum("dist") > 0, 1.0 / F.sum("dist")).otherwise(0.0).alias("closeness")
    )


def eccentricity(graph: Graph, sources: list[int]) -> DataFrame:
    """``(source, ecc)`` = max BFS level per source."""
    dists = multi_source_bfs(graph, sources)
    return dists.groupBy("source").agg(F.max("dist").alias("ecc"))
