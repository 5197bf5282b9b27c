"""Triangle counting — one-shot DataFrame job (north-rule algorithm).

Canonical-orientation join strategy: orient every undirected edge
low→high id, join paths ``a<b<c`` and close them with a semi-join, so
each triangle is counted exactly once. All three steps are ordinary
shuffled equi-joins — Catalyst/AQE pick broadcast vs sort-merge and
split skewed keys; the canonical orientation also bounds the join
fan-out by each vertex's *forward* degree (the standard degree-ordering
trick that tames hub vertices at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.plans.graph import Graph


def canonical_edges(graph: Graph) -> DataFrame:
    """Undirected simple edges oriented ``u < v``, deduped."""
    e = graph.edges.select("src", "dst")
    return (
        e.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def triangle_count(graph: Graph) -> int:
    """Total number of triangles in the undirected simple graph."""
    return triangle_df(graph).count()


def triangle_df(graph: Graph) -> DataFrame:
    """``(a, b, c)`` with ``a<b<c`` — one row per triangle."""
    e = canonical_edges(graph)
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    ac = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    return ab.join(bc, "b").join(ac, ["a", "c"], "left_semi").select("a", "b", "c")


def per_vertex_triangles(graph: Graph) -> DataFrame:
    """``(id, triangles)`` — triangles incident to each vertex."""
    t = triangle_df(graph)
    verts = (
        t.select(F.col("a").alias("id"))
        .unionAll(t.select(F.col("b").alias("id")))
        .unionAll(t.select(F.col("c").alias("id")))
    )
    return verts.groupBy("id").agg(F.count("*").alias("triangles"))
