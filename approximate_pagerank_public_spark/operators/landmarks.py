"""Landmark (pivot) distance sketches — constant-time shortest-path
distance estimates over web-scale graphs.

The standard technique when exact s-t shortest paths are too expensive
to answer online (Potamias, Bonchi, Castillo & Gionis, "Fast shortest
path distance estimation in large networks", CIKM 2009): pick ``k``
landmark vertices, precompute every vertex's distance TO and FROM each
landmark (k backward + k forward BFS sweeps — one batched multi-source
traversal each over the engine's frontier-sparse block kernel), and
answer ``d(u, v)`` with the upper bound

    d̂(u, v) = min_l  d(u, l) + d(l, v)

which is exact whenever some shortest u→v path passes through a
landmark (and always an upper bound by the triangle inequality).

Determinism / oracle: landmarks are the top-k IN-degree vertices with
ties broken by smaller id — a pure ``ORDER BY indeg DESC, id LIMIT k``
both engines replay exactly; the DuckDB oracle then recomputes both
BFS sweeps as recursive CTEs and takes the same min-plus combine, so
estimates are value-identical.

Scale shape: the precompute is 2 batched multi-source BFS runs (the
50-source batch at |E|=10⁸ is a measured 16–18 s workload in
BASELINE.md); the sketch is 2k small ints per vertex; answering a
query workload is a pair-table join against the k-row-per-vertex
sketch — no per-query traversal, no all-pairs anything. Unreachable
pairs surface as ``d_est = -1`` (both engines) rather than NULL so the
driver's value hash stays engine-independent.

Reference scope note: the reference engine ships BFS kernels
(``bfs/bfs2``); landmark sketches are the standard batched-BFS
application for distance queries on the same link graphs, added on the
engine's own traversal infrastructure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.plans.graph import Graph


def pick_landmarks(g: Graph, k: int = 4) -> list[int]:
    """Top-k in-degree vertex ids (ties → smaller id) — the
    highest-coverage deterministic landmark choice from the CIKM'09
    comparison that needs no randomness."""
    rows = (
        g.edges.groupBy("dst")
        .agg(F.count("*").alias("indeg"))
        .orderBy(F.col("indeg").desc(), F.col("dst").asc())
        .limit(k)
        .collect()
    )
    return [int(r["dst"]) for r in rows]


def landmark_sketch(g: Graph, landmarks: list[int]) -> tuple[DataFrame, DataFrame]:
    """(to_landmark, from_landmark) distance relations, both
    ``(landmark, id, dist)``: ``to`` = d(id → landmark) via one batched
    multi-source BFS on the reversed graph, ``from`` = d(landmark → id)
    on the forward graph."""
    from approximate_pagerank_public_spark.operators.traversal import (
        multi_source_bfs,
    )

    fwd = multi_source_bfs(g, landmarks).select(
        F.col("source").alias("landmark"), "id", F.col("dist").alias("d_from")
    )
    bwd = multi_source_bfs(g.reversed_graph(), landmarks).select(
        F.col("source").alias("landmark"), "id", F.col("dist").alias("d_to")
    )
    return bwd, fwd


def landmark_distance_estimates(
    g: Graph, pairs: DataFrame, k: int = 4
) -> DataFrame:
    """``(u, v, d_est)`` for each row of ``pairs(u, v)`` —
    ``min_l d(u,l) + d(l,v)`` over the top-k in-degree landmarks;
    ``-1`` when no landmark connects the pair."""
    landmarks = pick_landmarks(g, k)
    bwd, fwd = landmark_sketch(g, landmarks)
    est = (
        pairs.join(bwd.withColumnRenamed("id", "u"), "u")
        .join(fwd.withColumnRenamed("id", "v"), ["landmark", "v"])
        .groupBy("u", "v")
        .agg(F.min(F.col("d_to") + F.col("d_from")).alias("d_min"))
    )
    return (
        pairs.join(est, ["u", "v"], "left")
        .select(
            "u",
            "v",
            F.coalesce(F.col("d_min"), F.lit(-1)).cast("long").alias("d_est"),
        )
    )


def landmark_oracle_sql(
    edges_sql: str, k: int, pair_ids: list[int], max_dist: int = 100
) -> str:
    """DuckDB replay: same top-k-in-degree landmark pick, both BFS
    sweeps as multi-source recursive CTEs, same min-plus combine and
    ``-1`` fill. ``pair_ids`` enumerates the query block: all ordered
    pairs (u, v), u ≠ v, over that id list."""
    ids = ", ".join(f"({i})" for i in pair_ids)
    return (
        f"WITH e AS MATERIALIZED (SELECT src, dst FROM ({edges_sql})), "
        "lm AS MATERIALIZED (SELECT dst AS id FROM e GROUP BY dst "
        f"ORDER BY count(*) DESC, dst ASC LIMIT {k}), "
        "fwd AS (WITH RECURSIVE r(lmk, id, dist) AS ("
        "  SELECT id, id, 0 FROM lm UNION "
        "  SELECT r.lmk, e.dst, r.dist + 1 FROM r JOIN e ON e.src = r.id "
        f"  WHERE r.dist < {max_dist}) "
        "  SELECT lmk, id, min(dist) AS d_from FROM r GROUP BY lmk, id), "
        "bwd AS (WITH RECURSIVE r(lmk, id, dist) AS ("
        "  SELECT id, id, 0 FROM lm UNION "
        "  SELECT r.lmk, e.src, r.dist + 1 FROM r JOIN e ON e.dst = r.id "
        f"  WHERE r.dist < {max_dist}) "
        "  SELECT lmk, id, min(dist) AS d_to FROM r GROUP BY lmk, id), "
        f"qid(id) AS (VALUES {ids}), "
        "pairs AS (SELECT a.id AS u, b.id AS v FROM qid a, qid b "
        "WHERE a.id <> b.id), "
        "est AS (SELECT p.u, p.v, min(b.d_to + f.d_from) AS d_min "
        "FROM pairs p JOIN bwd b ON b.id = p.u "
        "JOIN fwd f ON f.id = p.v AND f.lmk = b.lmk "
        "GROUP BY p.u, p.v) "
        "SELECT p.u, p.v, "
        "CAST(coalesce(e2.d_min, -1) AS BIGINT) AS d_est "
        "FROM pairs p LEFT JOIN est e2 ON e2.u = p.u AND e2.v = p.v"
    )
