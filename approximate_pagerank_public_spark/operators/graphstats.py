"""Whole-graph structural statistics: degree assortativity, community
modularity, and per-community conductance.

Beyond the reference's per-vertex metrics; all are standard link-graph
health numbers (Newman 2002/2004; Kannan/Vempala/Vetta 2004) a 100-TB
pipeline wants as small summaries, and all are built so the final float
value is ONE division (or sqrt-product) over EXACT integer sums —
bit-identical across Spark and the DuckDB oracle with no truncation
games.

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


def _labels_broadcastable(graph: Graph) -> bool:
    """|V|-row label tables ride a broadcast join only below the ETL
    vertex gate — above it they hash-join (a label table the size of a
    100-TB graph's vertex set must never be shipped to every task)."""
    from approximate_pagerank_public_spark.operators.etl import (
        ETL_BROADCAST_MAX_VERTICES,
    )

    return graph.num_vertices <= ETL_BROADCAST_MAX_VERTICES


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
    if _labels_broadcastable(graph):
        od, ind = F.broadcast(od), F.broadcast(ind)
    j = e.join(od, "src").join(ind, "dst")
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


def type_mixing(graph: Graph) -> DataFrame:
    """``(src_type, dst_type, edges, r)`` — the attribute mixing matrix
    over entity-type prefixes (``tool:``/``role:``) plus Newman's
    attribute assortativity coefficient (Newman 2003 "Mixing patterns
    in networks", eq. 2): with integer counts c_ij, m = Σc,
    ``r = (m·Σc_ii − Σ_t row_t·col_t) / (m² − Σ_t row_t·col_t)`` — all
    sums exact BIGINTs, ONE IEEE division (0 when the denominator is 0,
    i.e. a single-type graph), so the value replays bit-exactly.

    Scale shape: two id→type joins of the edge relation against the
    vertex dictionary (broadcast under the ETL gate, shuffle otherwise)
    feeding one map-side-combined (src_type, dst_type) count; everything
    after that runs on ≤ |types|² rows."""
    ty = F.substring_index(F.col("entity"), ":", 1)
    v = graph.vertex_names.select("id", ty.alias("ty"))
    if _labels_broadcastable(graph):
        v = F.broadcast(v)
    e = graph.edges.select("src", "dst")
    typed = (
        e.join(v.select(F.col("id").alias("src"), F.col("ty").alias("src_type")), "src")
        .join(v.select(F.col("id").alias("dst"), F.col("ty").alias("dst_type")), "dst")
    )
    c = typed.groupBy("src_type", "dst_type").agg(F.count("*").alias("edges"))
    rows = c.groupBy(F.col("src_type").alias("t")).agg(F.sum("edges").alias("rs"))
    cols = c.groupBy(F.col("dst_type").alias("t")).agg(F.sum("edges").alias("cs"))
    ab = (
        rows.join(cols, "t", "full")
        .agg(
            F.coalesce(
                F.sum(
                    F.coalesce(F.col("rs"), F.lit(0))
                    * F.coalesce(F.col("cs"), F.lit(0))
                ),
                F.lit(0),
            ).alias("sum_ab")
        )
    )
    tot = c.agg(
        F.sum("edges").alias("m"),
        F.sum(
            F.when(F.col("src_type") == F.col("dst_type"), F.col("edges")).otherwise(
                F.lit(0)
            )
        ).alias("diag"),
    )
    num = (F.col("m") * F.col("diag") - F.col("sum_ab")).cast("double")
    den = (F.col("m") * F.col("m") - F.col("sum_ab")).cast("double")
    scalar = tot.crossJoin(ab).select(
        F.when(den == 0, F.lit(0.0)).otherwise(num / den).alias("r")
    )
    return c.crossJoin(F.broadcast(scalar)).select(
        "src_type", "dst_type", "edges", "r"
    )


def degree_gini(graph: Graph) -> DataFrame:
    """One row ``(n, total_degree, gini)`` — Gini coefficient of the
    total-degree distribution (the standard hubness/inequality scalar:
    0 = regular graph, →1 = one hub owns everything). Computed EXACTLY
    off the degree histogram: for a run of ``c`` vertices with degree
    ``v`` occupying ranks ``(lo, lo+c]`` of the ascending order,
    ``Σ i·x_i`` contributes ``v·(c·lo + c(c+1)/2)`` — all BIGINTs; the
    coefficient ``(2·S1 − (n+1)·S) / (n·S)`` is ONE IEEE division.

    The cumulative window runs over O(distinct degrees) histogram rows
    (the ``rich_club``/quantiles pattern), never over vertices."""
    from pyspark.sql.window import Window

    e = graph.edges.select("src", "dst")
    dg = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("v"))
    )
    hist = dg.groupBy("v").agg(F.count("*").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "v", "c", (F.sum("c").over(w) - F.col("c")).alias("lo")
    )
    term = F.col("v") * (
        F.col("c") * F.col("lo")
        + F.expr("(c * (c + 1)) div 2")
    )
    agg = cum.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("v") * F.col("c")).alias("total_degree"),
        F.sum(term).alias("s1"),
    )
    num = (
        F.lit(2) * F.col("s1")
        - (F.col("n") + F.lit(1)) * F.col("total_degree")
    ).cast("double")
    den = (F.col("n") * F.col("total_degree")).cast("double")
    return agg.select(
        "n",
        "total_degree",
        F.when(den == 0, F.lit(0.0)).otherwise(num / den).alias("gini"),
    )


def avg_neighbor_degree(graph: Graph) -> DataFrame:
    """Per-vertex mean out-degree of out-neighbors (the directed knn
    of Barrat et al. 2004): ``(id, deg, nbr_deg_sum, avg_nbr_deg)``.

    ``deg`` and ``nbr_deg_sum`` are exact BIGINTs (neighbors with no
    out-edges contribute 0); ``avg_nbr_deg`` is ONE IEEE division of
    two exact integers, so the value is bit-identical cross-engine.
    Only vertices with ``deg > 0`` appear (the mean over an empty
    neighbor set is undefined, not 0).

    Scale shape: one degree aggregation (map-side combinable) and one
    edge-pass join against the |V|-row degree table — broadcast below
    the ETL vertex gate, hash join above. No windows, no collects.
    """
    e = graph.edges.select("src", "dst")
    od = e.groupBy("src").agg(F.count("*").alias("ndeg"))
    nd = od.select(F.col("src").alias("dst"), "ndeg")
    if _labels_broadcastable(graph):
        nd = F.broadcast(nd)
    j = e.join(nd, "dst", "left").select(
        "src", F.coalesce("ndeg", F.lit(0)).alias("ndeg")
    )
    per = j.groupBy("src").agg(
        F.count("*").alias("deg"),
        F.sum("ndeg").alias("nbr_deg_sum"),
    )
    return per.select(
        F.col("src").alias("id"),
        "deg",
        "nbr_deg_sum",
        (F.col("nbr_deg_sum").cast("double") / F.col("deg").cast("double")).alias(
            "avg_nbr_deg"
        ),
    )


def reciprocity(graph: Graph) -> DataFrame:
    """One row ``(m, reciprocal, reciprocity)`` over the directed
    simple edge set: how many edges ``(u,v)`` have ``(v,u)`` present
    (Garlaschelli & Loffredo 2004's raw ratio ``r = L↔ / L``).

    ``m`` and ``reciprocal`` are exact counts; the ratio is one IEEE
    division — hash-exact cross-engine. Self-loops cannot contribute:
    the Graph's edge set has them removed at build time.

    Scale shape: one left-semi self-join on ``(src, dst)`` — both
    sides hash-partition on the same composite key, no broadcast
    needed at any |E| — plus two scalar aggregates.
    """
    e = graph.edges.select("src", "dst")
    r = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    rec = e.join(r, ["src", "dst"], "left_semi").agg(
        F.count("*").alias("reciprocal")
    )
    m = e.agg(F.count("*").alias("m"))
    return m.crossJoin(F.broadcast(rec)).select(
        "m",
        "reciprocal",
        F.when(F.col("m") == 0, F.lit(0.0))
        .otherwise(F.col("reciprocal").cast("double") / F.col("m").cast("double"))
        .alias("reciprocity"),
    )


def global_transitivity(graph: Graph) -> DataFrame:
    """One row ``(n_triangles, wedges, transitivity)`` over the
    symmetrized simple graph: Newman's global clustering coefficient
    ``3·T / W`` where ``T`` is the undirected triangle count and
    ``W = Σ_v d(v)(d(v)−1)/2`` the wedge (connected-triple) count.

    ``T`` and ``W`` are exact BIGINTs (each ``d(d−1)`` term is even, so
    the ``/2`` is exact integer division); the ratio is computed as
    ``3T / W`` — ONE IEEE division of two exact integers, bit-identical
    cross-engine.

    Scale shape: the same id-oriented wedge join as
    :func:`~..operators.triangles.triangle_df` (the heaviest but
    well-understood primitive — degree-capping applies upstream if a
    corpus needs it) plus one |V|-row degree aggregation; both reduce
    to scalars, so nothing large leaves the cluster.
    """
    from approximate_pagerank_public_spark.operators.triangles import (
        canonical_edges,
        triangle_df,
    )

    e = canonical_edges(graph)
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    w2 = deg.agg(F.sum(F.col("d") * (F.col("d") - 1)).alias("w2"))
    t = triangle_df(graph).agg(F.count("*").alias("n_triangles"))
    return t.crossJoin(F.broadcast(w2)).select(
        "n_triangles",
        (F.col("w2") / 2).cast("long").alias("wedges"),
        F.when(F.coalesce(F.col("w2"), F.lit(0)) == 0, F.lit(0.0))
        .otherwise(
            (F.col("n_triangles") * 3).cast("double")
            / (F.col("w2") / 2).cast("long").cast("double")
        )
        .alias("transitivity"),
    )


def rich_club(graph: Graph) -> DataFrame:
    """Rich-club coefficients ``(k, n_k, e_k, phi)`` for every degree
    value ``k`` present in the symmetrized simple graph (Zhou & Mondragón
    2004): ``n_k`` vertices with degree **strictly greater** than ``k``,
    ``e_k`` undirected edges whose BOTH endpoints have degree > ``k``,
    and ``phi = 2·e_k / (n_k·(n_k−1))`` — the density of the subgraph
    induced by the rich club. Rows with ``n_k < 2`` are dropped (phi is
    undefined on <2 vertices).

    ``n_k``/``e_k`` are exact BIGINTs; ``phi`` is ONE IEEE division of
    exact integers — hash-exact cross-engine, no truncation.

    Scale shape: a |V|-row degree aggregation, one edge pass joining the
    degree table on both endpoints (broadcast below the ETL vertex gate),
    then two DEGREE-HISTOGRAM-sized relations (distinct degree values —
    thousands of rows at any |E|) merged and cumulated with a single
    descending window. The global window runs over the histogram, never
    over vertices or edges, so the single-partition sort is O(distinct
    degrees) — the one place a global window is acceptable.
    """
    from pyspark.sql import Window

    from approximate_pagerank_public_spark.operators.triangles import (
        canonical_edges,
    )

    e = canonical_edges(graph)
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    if _labels_broadcastable(graph):
        du, dv = F.broadcast(du), F.broadcast(dv)
    emin = e.join(du, "u").join(dv, "v").select(
        F.least("du", "dv").alias("d")
    )
    nh = deg.groupBy("d").agg(F.count("*").alias("nd"))
    eh = emin.groupBy("d").agg(F.count("*").alias("ne"))
    merged = (
        nh.join(eh, "d", "full_outer")
        .select(
            F.col("d").alias("k"),
            F.coalesce("nd", F.lit(0)).alias("nd"),
            F.coalesce("ne", F.lit(0)).alias("ne"),
        )
    )
    w = Window.orderBy(F.col("k").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = merged.select(
        "k",
        F.coalesce(F.sum("nd").over(w), F.lit(0)).alias("n_k"),
        F.coalesce(F.sum("ne").over(w), F.lit(0)).alias("e_k"),
    ).where(F.col("n_k") >= 2)
    return cum.select(
        "k",
        "n_k",
        "e_k",
        (
            (F.col("e_k") * 2).cast("double")
            / (F.col("n_k") * (F.col("n_k") - 1)).cast("double")
        ).alias("phi"),
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
    if _labels_broadcastable(graph):
        ls, ld = F.broadcast(ls), F.broadcast(ld)
    j = und.join(ls, "src").join(ld, "dst")
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


def community_conductance(graph: Graph, labels: DataFrame) -> DataFrame:
    """Per-community conductance over the symmetrized simple graph:
    ``(label, vol, cut, conductance)`` where, on the both-direction
    undirected row set (M2 = rows = 2m), ``vol(C)`` = rows with src in
    C (the summed member degree) and ``cut(C)`` = rows leaving C.

    φ(C) = cut / min(vol, M2 − vol) — the standard bottleneck measure
    (Kannan/Vempala/Vetta 2004). vol and cut are exact integers; φ is
    one IEEE division, emitted only for communities with
    0 < vol < M2 (a community holding every edge endpoint has no
    complement to leak into — excluded rather than given a 0/0
    convention). Communities of isolated vertices (vol = 0) never
    appear in the edge pass and are likewise absent.

    Scale shape: one |2m|-row label join (broadcast below the ETL
    vertex gate, hash above), one map-side-combined per-label
    aggregation, and a scalar M2 cross join — no windows, no collects.
    """
    e = graph.edges.select("src", "dst")
    und = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("src_label"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("dst_label"))
    if _labels_broadcastable(graph):
        ls, ld = F.broadcast(ls), F.broadcast(ld)
    j = und.join(ls, "src").join(ld, "dst")
    per = j.groupBy(F.col("src_label").alias("label")).agg(
        F.count("*").alias("vol"),
        F.sum(
            F.when(F.col("src_label") != F.col("dst_label"), 1).otherwise(0)
        ).alias("cut"),
    )
    m2 = und.agg(F.count("*").alias("m2"))
    return (
        per.crossJoin(F.broadcast(m2))
        .where((F.col("vol") > 0) & (F.col("vol") < F.col("m2")))
        .select(
            "label",
            "vol",
            "cut",
            (
                F.col("cut").cast("double")
                / F.least(F.col("vol"), F.col("m2") - F.col("vol")).cast("double")
            ).alias("conductance"),
        )
    )


def degree_outliers(graph: Graph) -> DataFrame:
    """Hub/anomaly detection via the robust median/MAD rule — all
    integer, hash-exact: a vertex is an outlier when
    ``|deg − median| > max(3·MAD, 1)`` over TOTAL degree (in + out on
    the deduped directed edges, isolated vertices included at 0).

    Median and MAD are exact "lower" discrete quantiles computed with
    the histogram + cumulative-sum trick (`functions/quantiles.py`):
    the only pass over the data is one map-side-combinable degree
    count; both medians run over the O(distinct degrees) histogram.
    The classic data-quality gate before ranking a web-scale crawl
    (cut spam hubs / stuck crawlers before they drown PageRank).

    Output: ``(id, degree, med, mad)`` for outlier vertices only (med /
    mad repeated per row so the contract hash pins them too)."""
    e = graph.edges
    deg = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    full = graph.vertices.join(deg, "id", "left").select(
        "id", F.coalesce("degree", F.lit(0)).cast("long").alias("degree")
    )

    def _median_of(df: DataFrame, col: str) -> F.Column:
        from pyspark.sql import Window

        hist = df.groupBy(F.col(col).alias("v")).agg(F.count("*").alias("c"))
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        cum = hist.select("v", "c", F.sum("c").over(w).alias("hi"))
        tot = hist.agg(F.sum("c").alias("n"))
        rank = F.expr("(n - 1) div 2")
        med = (
            cum.crossJoin(F.broadcast(tot))
            .where((rank >= F.col("hi") - F.col("c")) & (rank < F.col("hi")))
            .select(F.col("v"))
        )
        return med

    med_df = _median_of(full, "degree").withColumnRenamed("v", "med")
    with_med = full.crossJoin(F.broadcast(med_df))
    dev = with_med.select(
        "id", "degree", "med", F.abs(F.col("degree") - F.col("med")).alias("d")
    )
    mad_df = _median_of(dev, "d").withColumnRenamed("v", "mad")
    return (
        dev.crossJoin(F.broadcast(mad_df))
        .where(
            F.col("d") > F.greatest(F.lit(3) * F.col("mad"), F.lit(1))
        )
        .select("id", "degree", F.col("med").cast("long"), F.col("mad").cast("long"))
    )


def euler_check(graph: Graph) -> DataFrame:
    """One-row Eulerian feasibility summary of the symmetrized simple
    graph: ``(odd_degree, n_used_components, has_circuit, has_path)``.
    A connected (over non-isolated vertices) graph has an Euler circuit
    iff every degree is even, and an Euler path iff 0 or 2 vertices
    have odd degree.  Degrees count the deduped undirected pair list.

    Scale shape: one distinct + one map-side-combinable degree agg,
    plus the existing components pass — no new machinery."""
    from approximate_pagerank_public_spark.operators.components import (
        connected_components,
    )

    e = graph.edges.select("src", "dst")
    pairs = (
        e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        pairs.select(F.col("a").alias("id"))
        .unionAll(pairs.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    comp = connected_components(graph)
    used = deg.join(comp, "id")
    # coalesce ONCE and derive the booleans from the coalesced values
    # (an edgeless graph aggregates sum→NULL; deriving has_circuit from
    # the raw aggregate diverged from the coalesced output column)
    agg = used.agg(
        F.coalesce(
            F.sum((F.col("deg") % 2).cast("long")), F.lit(0)
        ).alias("odd_degree"),
        F.coalesce(
            F.countDistinct("component"), F.lit(0)
        ).alias("n_used_components"),
    )
    return agg.select(
        "odd_degree",
        "n_used_components",
        (
            (F.col("odd_degree") == 0) & (F.col("n_used_components") == 1)
        ).alias("has_circuit"),
        (
            F.col("odd_degree").isin(0, 2) & (F.col("n_used_components") == 1)
        ).alias("has_path"),
    )


def _incremental_giant_curve(
    spark, deltas, num_partitions: int
) -> dict:
    """Shared warm-start core for the robustness curves: process the
    points SMALLEST edge set first; each later point contributes only
    its DELTA pairs (the edges added relative to the previous point).

    Adding edges can only MERGE components (never split them), so the
    previous point's labels are a valid contraction basis: map the
    delta's endpoints through the running ``(id, comp)`` labels, run
    star-CC over the (tiny) contracted pair list, and fold the merge
    map into the running ``(comp, n)`` size table. Per point this costs
    one |delta|-sized join plus a star-CC over contracted pairs —
    instead of a full from-scratch star-CC over the whole survivor
    list (measured ~160 s/point at |E|=2·10⁷; the r4 verdict's
    warm-start ask). Running from-scratch at the SMALLEST point keeps
    every point's result exactly the exact CC — the curve values are
    unchanged, only the work is incremental.

    ``deltas``: ordered ``[(key, delta_df(a, b)), ...]``; returns
    ``{key: giant_size}``. Label/size state rotates ``local_ckpt``
    (the checkpoint-leak rule); the final state is freed too — only
    the scalar curve leaves this function.
    """
    from approximate_pagerank_public_spark.operators.components import (
        star_components_edges,
    )
    from ..plans.checkpoint import free_local_ckpt, local_ckpt

    lab = units = None
    lab_ids = units_ids = None
    out: dict = {}
    for key, delta in deltas:
        d = delta.select("a", "b")
        if lab is not None:
            con = (
                d.join(
                    lab.select(F.col("id").alias("a"), F.col("comp").alias("_ca")),
                    "a",
                    "left",
                )
                .join(
                    lab.select(F.col("id").alias("b"), F.col("comp").alias("_cb")),
                    "b",
                    "left",
                )
                .select(
                    F.coalesce("_ca", F.col("a")).alias("a"),
                    F.coalesce("_cb", F.col("b")).alias("b"),
                )
            )
        else:
            con = d
        con = con.where(F.col("a") != F.col("b")).distinct()
        new_ids = (
            d.select(F.col("a").alias("id"))
            .unionAll(d.select(F.col("b").alias("id")))
            .distinct()
        )
        if lab is not None:
            new_ids = new_ids.join(lab, "id", "left_anti")
        roots = None
        if con.limit(1).count() > 0:
            roots, _rounds = star_components_edges(spark, con, num_partitions)

        def _merge(df: DataFrame, col: str) -> DataFrame:
            if roots is None:
                return df
            return df.join(roots, df[col] == roots["a"], "left").select(
                *[c for c in df.columns if c != col],
                F.least(F.col(col), F.coalesce("r", F.col(col))).alias(col),
            )

        base_units = (
            units.select("comp", "n")
            if units is not None
            else spark.createDataFrame([], "comp long, n long")
        )
        new_units = _merge(
            base_units.unionAll(
                new_ids.select(
                    F.col("id").alias("comp"), F.lit(1).cast("long").alias("n")
                )
            ),
            "comp",
        ).groupBy("comp").agg(F.sum("n").alias("n"))
        base_lab = (
            lab
            if lab is not None
            else spark.createDataFrame([], "id long, comp long")
        )
        new_lab = _merge(
            base_lab.unionAll(new_ids.select("id", F.col("id").alias("comp"))),
            "comp",
        )
        new_units, nu_ids = local_ckpt(new_units)
        new_lab, nl_ids = local_ckpt(new_lab)
        giant = new_units.agg(F.max("n").alias("g")).first()["g"]
        out[key] = int(giant) if giant is not None else 0
        if units_ids is not None:
            free_local_ckpt(spark, units_ids)
            free_local_ckpt(spark, lab_ids)
        units, units_ids = new_units, nu_ids
        lab, lab_ids = new_lab, nl_ids
    if units_ids is not None:
        free_local_ckpt(spark, units_ids)
        free_local_ckpt(spark, lab_ids)
    return out


def attack_tolerance(graph: Graph, ks=(0, 1, 4, 16)) -> DataFrame:
    """``(k, removed, giant_size)`` — the Albert–Barabási targeted-
    attack curve: remove the ``k`` highest-degree vertices (undirected
    degree, ties → smaller id) and report the largest surviving weak
    component.  The standard robustness census of a hub-dominated link
    graph (scale-free graphs fall apart under targeted removal while
    surviving random failure).

    Scale shape: ONE degree aggregation picks the global top-max(k)
    hit list (a tiny broadcastable set); the curve then runs WARM —
    from the most-attacked point up, each point re-adds only the edges
    incident to its restored hubs and merges them into the previous
    point's component labels (:func:`_incremental_giant_curve`; adding
    edges only merges components, so the values are exactly the
    from-scratch CC). ``removed`` echoes how many hit-list vertices
    actually exist (k may exceed |V|)."""
    e = graph.edges.select("src", "dst")
    pairs = (
        e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        pairs.select(F.col("a").alias("id"))
        .unionAll(pairs.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    kmax = max(int(x) for x in ks)
    hits = [
        int(r["id"])
        for r in deg.orderBy(F.col("deg").desc(), F.col("id").asc())
        .limit(kmax)
        .collect()
    ]
    # smallest survivor set first (largest k); each later point adds
    # back exactly the edges incident to its restored hubs
    ks_desc = sorted({int(x) for x in ks}, reverse=True)
    deltas = []
    prev_k = None
    for k in ks_desc:
        keep_out = hits[:k]
        alive = (
            ~F.col("a").isin(keep_out) & ~F.col("b").isin(keep_out)
            if keep_out
            else F.lit(True)
        )
        if prev_k is None:
            delta = pairs.where(alive)
        else:
            back = hits[k:prev_k]  # hubs restored at this point
            delta = pairs.where(
                (F.col("a").isin(back) | F.col("b").isin(back)) & alive
            )
        deltas.append((k, delta))
        prev_k = k
    giants = _incremental_giant_curve(
        graph.spark, deltas, graph.num_partitions
    )
    rows = [
        (k, len(hits[:k]), giants[k]) for k in sorted(int(x) for x in ks)
    ]
    import pandas as pd

    return graph.spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "removed", "giant_size"]).astype(
            "int64"
        ),
        "k long, removed long, giant_size long",
    )


def random_failure_curve(graph: Graph, keep_pcts=(100, 75, 50, 25)) -> DataFrame:
    """``(keep_pct, kept_pairs, giant_size)`` — the random-failure
    percolation curve complementing :func:`attack_tolerance` (the
    Albert–Barabási contrast: scale-free graphs survive random failure
    but collapse under targeted attack).  Edge survival is a
    deterministic md5 percent of the canonical pair (oracle-replayable,
    sampling-invariant under growth).

    Scale shape: the survival predicate is a codegen'd expression over
    the canonical pair list, and survivor sets are NESTED
    (``pct < 25 ⊂ pct < 50 ⊂ …``), so the curve runs warm from the
    sparsest point up via :func:`_incremental_giant_curve` — each point
    merges only its ``pct ∈ [prev, keep)`` delta into the previous
    labels; values are exactly the from-scratch CC."""
    e = graph.edges.select("src", "dst")
    pairs = (
        e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .select(
            "a",
            "b",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit("rf"), F.col("a"), F.col("b"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(100),
            ).alias("pct"),
        )
        .localCheckpoint()
    )
    keeps_asc = sorted({int(x) for x in keep_pcts})
    deltas = []
    prev = None
    for keep in keeps_asc:
        cond = F.col("pct") < keep
        if prev is not None:
            cond = cond & (F.col("pct") >= prev)
        deltas.append((keep, pairs.where(cond).select("a", "b")))
        prev = keep
    giants = _incremental_giant_curve(
        graph.spark, deltas, graph.num_partitions
    )
    kept_counts: dict[int, int] = {}
    run = 0
    for keep, delta in deltas:
        run += delta.count()
        kept_counts[keep] = run
    rows = [
        (keep, kept_counts[keep], giants[keep])
        for keep in sorted((int(x) for x in keep_pcts), reverse=True)
    ]
    import pandas as pd

    return graph.spark.createDataFrame(
        pd.DataFrame(rows, columns=["keep_pct", "kept_pairs", "giant_size"]).astype(
            "int64"
        ),
        "keep_pct long, kept_pairs long, giant_size long",
    )
