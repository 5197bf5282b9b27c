"""Triangle counting — one-shot DataFrame job (north-rule algorithm).

Degree-ordered orientation (node-iterator++): every undirected edge is
oriented from the endpoint with the smaller ``(degree, id)`` to the
larger, wedges are pairs of forward neighbors of the lowest-rank vertex,
and a semi-join against the oriented edges closes them — each triangle
counted exactly once at its minimum-rank corner. Orienting by DEGREE
(not id) bounds every vertex's forward degree by O(√E), so the wedge
self-join fan-out is O(E^{3/2}) worst case regardless of which ids the
hubs landed on — id-orientation is only safe when hub ids happen to sort
low, which nothing guarantees for transcript-derived entities. All steps
are ordinary shuffled equi-joins — Catalyst/AQE pick broadcast vs
sort-merge and split skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.plans.graph import Graph


def canonical_edges(graph: Graph) -> DataFrame:
    """Undirected simple edges oriented ``u < v`` by id, deduped."""
    e = graph.edges.select("src", "dst")
    return (
        e.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def degree_oriented_edges(graph: Graph) -> DataFrame:
    """``(x, y, dy)``: each undirected edge once, oriented so
    ``(deg(x), x) < (deg(y), y)``; ``dy`` carries deg(y) so downstream
    wedge generation can rank two forward neighbors without re-joining."""
    e = canonical_edges(graph)
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    ed = (
        e.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("y"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dy"),
    )


def triangle_count(graph: Graph) -> int:
    """Total number of triangles in the undirected simple graph."""
    return triangle_df(graph).count()


def triangle_df(graph: Graph) -> DataFrame:
    """``(a, b, c)`` with ``a<b<c`` (by id) — one row per triangle."""
    o = degree_oriented_edges(graph)
    p1 = o.select("x", F.col("y").alias("p"), F.col("dy").alias("dp"))
    p2 = o.select("x", F.col("y").alias("q"), F.col("dy").alias("dq"))
    wedges = p1.join(p2, "x").where(
        (F.col("dp") < F.col("dq"))
        | ((F.col("dp") == F.col("dq")) & (F.col("p") < F.col("q")))
    )
    closing = o.select(F.col("x").alias("p"), F.col("y").alias("q"))
    tri = wedges.join(closing, ["p", "q"], "left_semi")
    s = F.array_sort(F.array("x", "p", "q"))
    return tri.select(s[0].alias("a"), s[1].alias("b"), s[2].alias("c"))


def per_vertex_triangles(graph: Graph) -> DataFrame:
    """``(id, triangles)`` — triangles incident to each vertex."""
    t = triangle_df(graph)
    verts = (
        t.select(F.col("a").alias("id"))
        .unionAll(t.select(F.col("b").alias("id")))
        .unionAll(t.select(F.col("c").alias("id")))
    )
    return verts.groupBy("id").agg(F.count("*").alias("triangles"))
