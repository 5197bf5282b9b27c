"""Whole-graph structural statistics: degree assortativity and
community modularity.

Beyond the reference's per-vertex metrics; both are standard link-graph
health numbers (Newman 2002/2004) a 100-TB pipeline wants as one-row
summaries, and both are built so the final float value is ONE division
(or sqrt-product) over EXACT integer sums — bit-identical across Spark
and the DuckDB oracle with no truncation games.

Scale shape: a couple of vertex-count-sized groupBy aggregations plus
one edge-pass join against the (broadcastable) degree tables; every sum
is map-side combinable; no windows, no collects.

Overflow bounds (documented, not enforced): the integer sums fit BIGINT
while ``Σ deg², Σ (deg_u·deg_v)`` < 2^63 — true through ~10^9-edge
graphs with hub degrees ≤ ~10^6; beyond that switch the sums to DOUBLE
and accept ulp-level cross-engine drift (not needed for the contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.plans.graph import Graph


def degree_assortativity(graph: Graph) -> DataFrame:
    """One row ``(m, assortativity)`` — Pearson correlation between
    out-degree(src) and in-degree(dst) across directed edges (Newman
    2002, out-in flavor). Sums are exact BIGINTs; the coefficient is
    ``num / (sqrt(vx) * sqrt(vy))`` over exact-integer-valued doubles —
    sqrt/mul/div are single correctly-rounded IEEE ops, so the value is
    bit-identical in any engine."""
    e = graph.edges.select("src", "dst")
    od = e.groupBy("src").agg(F.count("*").alias("xd"))
    ind = e.groupBy("dst").agg(F.count("*").alias("yd"))
    j = e.join(F.broadcast(od), "src").join(F.broadcast(ind), "dst")
    s = j.agg(
        F.count("*").alias("m"),
        F.sum("xd").alias("sx"),
        F.sum("yd").alias("sy"),
        F.sum(F.col("xd") * F.col("yd")).alias("sxy"),
        F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
        F.sum(F.col("yd") * F.col("yd")).alias("syy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    den = F.sqrt(vx) * F.sqrt(vy)
    return s.select(
        "m",
        F.when(den == 0, F.lit(0.0)).otherwise(num / den).alias("assortativity"),
    )


def modularity(graph: Graph, labels: DataFrame) -> DataFrame:
    """One row ``(n_communities, modularity)`` of a vertex partition
    (``labels``: ``(id, label)``) over the symmetrized simple graph.

    Newman's Q = Σ_c (e_c/m − (d_c/2m)²), folded to the single-division
    integer form ``(M2·ΣW_c − ΣD_c²) / M2²`` where, over the
    both-direction undirected row set, ``M2 = rows (= 2m)``, ``W_c`` =
    same-label rows, ``D_c`` = rows with src in c. The numerator and
    denominator are exact integers (as long as M2² < 2^53), so Q is one
    IEEE division — hash-exact cross-engine."""
    e = graph.edges.select("src", "dst")
    und = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("src_label"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("dst_label"))
    j = und.join(F.broadcast(ls), "src").join(F.broadcast(ld), "dst")
    per_label = j.groupBy("src_label").agg(
        F.count("*").alias("d_c"),
        F.sum(
            F.when(F.col("src_label") == F.col("dst_label"), 1).otherwise(0)
        ).alias("w_c"),
    )
    s = per_label.agg(
        F.count("*").alias("n_communities"),
        F.sum("d_c").alias("m2"),
        F.sum("w_c").alias("sw"),
        F.sum(F.col("d_c") * F.col("d_c")).alias("sd2"),
    )
    q = (F.col("m2") * F.col("sw") - F.col("sd2")).cast("double") / (
        F.col("m2") * F.col("m2")
    ).cast("double")
    return s.select("n_communities", q.alias("modularity"))
