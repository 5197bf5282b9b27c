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

import numpy as np
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


def _bfs_dists(graph: Graph, sources: list[int]) -> DataFrame:
    """Pick the batched block kernel when CSR blocks exist, else the
    distributed frontier joins — identical exact distances either way."""
    if graph.blocks is not None:
        return multi_source_bfs_block(graph, sources)
    return multi_source_bfs(graph, sources)


def closeness_centrality(graph: Graph, sources: list[int]) -> DataFrame:
    """``(source, closeness)``: ``1/Σ dist`` over reached vertices; 0 when
    the source reaches nothing (matches ``cc.gm`` disconnected handling)."""
    dists = _bfs_dists(graph, sources)
    return dists.groupBy("source").agg(
        F.when(F.sum("dist") > 0, 1.0 / F.sum("dist")).otherwise(0.0).alias("closeness")
    )


def eccentricity(graph: Graph, sources: list[int]) -> DataFrame:
    """``(source, ecc)`` = max BFS level per source."""
    dists = _bfs_dists(graph, sources)
    return dists.groupBy("source").agg(F.max("dist").alias("ecc"))




def multi_source_bfs_block(
    graph: Graph, sources: list[int], max_levels: int = 10_000
) -> DataFrame:
    """Block-kernel multi-source BFS: the S distance vectors advance as
    one (N, S) int64 block through min-plus supersteps on the same CSR
    machinery as PageRank/CC — ``dist' = min(dist, min_in(dist) + 1)``
    (level-synchronous, reference ``bfs.gm:1-14`` semantics, S sources
    amortizing each edge pass like the FPGA's 8-query batching). One
    shuffle-free Spark job per level; right when vertex state fits the
    driver. Returns ``(source, id, dist)`` over reached vertices only,
    like :func:`multi_source_bfs`.
    """
    import pandas as pd

    n = graph.num_vertices
    s = len(sources)
    # narrow dtype = 4-8x less state traffic per superstep (the block is
    # (N, S) and every edge reads an S-wide row); distances are bounded
    # by the diameter, so int16 suffices below 15k levels
    if max_levels < 15_000:
        dtype, inf = np.int16, np.int16(16_000)
    else:
        dtype, inf = np.int32, np.int32(np.iinfo(np.int32).max // 4)
    dist = np.full((n, s), inf, dtype=dtype)
    for i, src in enumerate(sources):
        dist[src, i] = 0
    blocks = graph.blocks
    if blocks is None:
        return multi_source_bfs(graph, sources, max_levels)
    one = dtype(1)
    for _ in range(max_levels):
        # gather(min) merges with the own label, so it returns
        # m = min(dist, min_in); min(dist, m+1) == min(dist, min_in+1)
        m = blocks.gather(dist, op="min")
        new = np.minimum(dist, (m + one).astype(dtype))
        if np.array_equal(new, dist):
            break
        dist = new
    vid, sidx = np.nonzero(dist < inf - 1000)
    pdf = pd.DataFrame(
        {
            "source": np.asarray(sources, dtype=np.int64)[sidx],
            "id": vid.astype(np.int64),
            "dist": dist[vid, sidx],
        }
    )
    return graph.spark.createDataFrame(pdf, "source long, id long, dist long")
