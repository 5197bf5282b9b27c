"""Directed triad census (Davis–Leinhardt 16 classes).

The classic directed-link-graph structure summary: every unordered
vertex triple falls into one of 16 isomorphism classes (003 … 300,
MAN labels). Counting them naively is O(n³); the engine uses the
Batagelj–Mrvar split (Social Networks 23, 2001):

- triples with ≥2 LINKED pairs are enumerated explicitly via the same
  wedge join as triangle counting (pairs of linked pairs sharing a
  vertex — O(Σdeg²) work, the well-understood heavy primitive), each
  classified by a 6-bit labeled adjacency code over its three pair
  states and a precomputed 64→16 lookup;
- triples with exactly ONE linked pair are a closed form:
  ``n_pairs·(n−2) − Σ(linked pairs inside the enumerated triples)``,
  split 012/102 by the pair being asymmetric/mutual;
- 003 is the complement to C(n,3).

Everything is exact integer arithmetic ⇒ hash-exact cross-engine; the
DuckDB oracle is an INDEPENDENT brute-force formulation (all v1<v2<v3
triples, six edge left-joins, same 64-entry lookup) — feasible at the
oracle's sf0.01 scale, while the engine side stays wedge-bounded at
any scale.

The 64-entry lookup maps the labeled code of a triple in canonical
(a<b<c) vertex order — bit i set per ``PAIRS=[(ab),(ba),(ac),(ca),
(bc),(cb)]`` — to its class; generated offline by canonicalizing all
64 labeled 3-vertex digraphs against the standard prototypes
(A<->B<-C = 111D, A<-B->C = 021D, etc.).

Scale shape: one pair-state aggregation (edge-sized, map-side
combinable), the wedge self-join (hub-quadratic like triangles — the
same upstream degree-capping mitigation applies), three broadcast-or-
hash pair-state lookups, then ≤16-row aggregates; the closed forms
ride on two scalar sums. The final 16-row census is assembled
driver-side from ≤16 aggregated rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.plans.graph import Graph

TRIAD_LABELS = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]

# labeled 6-bit code (a<b<c order) -> triad class; see module docstring
LOOKUP = {
    0: "003", 1: "012", 2: "012", 3: "102", 4: "012", 5: "021D",
    6: "021C", 7: "111U", 8: "012", 9: "021C", 10: "021U", 11: "111D",
    12: "102", 13: "111U", 14: "111D", 15: "201", 16: "012", 17: "021C",
    18: "021D", 19: "111U", 20: "021U", 21: "030T", 22: "030T",
    23: "120U", 24: "021C", 25: "030C", 26: "030T", 27: "120C",
    28: "111D", 29: "120C", 30: "120D", 31: "210", 32: "012",
    33: "021U", 34: "021C", 35: "111D", 36: "021C", 37: "030T",
    38: "030C", 39: "120C", 40: "021D", 41: "030T", 42: "030T",
    43: "120D", 44: "111U", 45: "120U", 46: "120C", 47: "210",
    48: "102", 49: "111D", 50: "111U", 51: "201", 52: "111D",
    53: "120D", 54: "120C", 55: "210", 56: "111U", 57: "120C",
    58: "120U", 59: "210", 60: "201", 61: "210", 62: "210", 63: "300",
}


def _pair_states(e: DataFrame) -> DataFrame:
    """``(u, v, st)`` per linked unordered pair, u<v: st 1 = u→v only,
    2 = v→u only, 3 = mutual."""
    pr = e.select(
        F.least("src", "dst").alias("u"),
        F.greatest("src", "dst").alias("v"),
        (F.col("src") < F.col("dst")).cast("int").alias("fwd"),
    )
    return pr.groupBy("u", "v").agg(
        (F.max("fwd") + 2 * F.max(1 - F.col("fwd"))).alias("st")
    )


def triad_census(graph: Graph) -> DataFrame:
    """``(triad, n)`` — all 16 classes, exact BIGINT counts summing to
    C(num_vertices, 3)."""
    spark = graph.spark
    n = graph.num_vertices
    e = graph.edges.select("src", "dst").where(
        F.col("src") != F.col("dst")
    ).distinct()
    pair = _pair_states(e).persist()

    # triples with >= 2 linked pairs, via the wedge join on linked pairs
    nb = pair.select(F.col("u").alias("w"), F.col("v").alias("x")).unionAll(
        pair.select(F.col("v").alias("w"), F.col("u").alias("x"))
    )
    tri = (
        nb.alias("p")
        .join(nb.alias("q"), "w")
        .where(F.col("p.x") < F.col("q.x"))
        .select(
            F.array_sort(F.array("w", "p.x", "q.x")).alias("t")
        )
        .select(F.col("t")[0].alias("a"), F.col("t")[1].alias("b"), F.col("t")[2].alias("c"))
        .distinct()
    )
    st = lambda a, b, name: pair.select(
        F.col("u").alias(a), F.col("v").alias(b), F.col("st").alias(name)
    )
    coded = (
        tri.join(st("a", "b", "sab"), ["a", "b"], "left")
        .join(st("a", "c", "sac"), ["a", "c"], "left")
        .join(st("b", "c", "sbc"), ["b", "c"], "left")
        .select(
            (
                F.coalesce("sab", F.lit(0))
                + F.coalesce("sac", F.lit(0)) * 4
                + F.coalesce("sbc", F.lit(0)) * 16
            ).alias("code"),
            sum(
                (F.coalesce(c, F.lit(0)) == 3).cast("long")
                for c in (F.col("sab"), F.col("sac"), F.col("sbc"))
            ).alias("km"),
            sum(
                F.coalesce(c, F.lit(0)).isin(1, 2).cast("long")
                for c in (F.col("sab"), F.col("sac"), F.col("sbc"))
            ).alias("ka"),
        )
    )
    lookup_expr = F.create_map(
        *[x for c, lab in LOOKUP.items() for x in (F.lit(c), F.lit(lab))]
    )
    agg = (
        coded.select(lookup_expr[F.col("code")].alias("triad"), "km", "ka")
        .groupBy("triad")
        .agg(
            F.count("*").alias("n"),
            F.sum("km").alias("skm"),
            F.sum("ka").alias("ska"),
        )
        .collect()  # <= 13 rows: the post-aggregation census only
    )
    pstats = pair.groupBy().agg(
        F.sum((F.col("st") == 3).cast("long")).alias("nm"),
        F.sum(F.col("st").isin(1, 2).cast("long")).alias("na"),
    ).first()
    pair.unpersist()

    counts = {lab: 0 for lab in TRIAD_LABELS}
    sum_km = sum_ka = total_ge2 = 0
    for r in agg:
        counts[r["triad"]] += r["n"]
        sum_km += r["skm"]
        sum_ka += r["ska"]
        total_ge2 += r["n"]
    nm = int(pstats["nm"] or 0)
    na = int(pstats["na"] or 0)
    counts["102"] = nm * (n - 2) - sum_km
    counts["012"] = na * (n - 2) - sum_ka
    counts["003"] = (
        n * (n - 1) * (n - 2) // 6 - total_ge2 - counts["102"] - counts["012"]
    )
    return spark.createDataFrame(
        [(lab, int(counts[lab])) for lab in TRIAD_LABELS],
        "triad string, n long",
    )
