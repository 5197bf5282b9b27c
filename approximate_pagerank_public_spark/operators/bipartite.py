"""Bipartite projection: part–item incidence → item co-occurrence graph.

The transcript tables are naturally bipartite (conversations × tools,
conversations × roles); the projection "which tools co-occur in the same
conversation, and how often" is the standard way to turn that incidence
into a weighted item–item graph for downstream community/centrality
analysis (the reference analyses one-mode graphs only — this derives one
from the two-mode data the transcripts actually contain).

Scale design — the projection's hazard is the same one as LSH banding
(``operators/dedup.py``): a part containing k items emits k·(k−1)/2
pairs, so ONE degenerate part (a conversation that touched every tool)
can dominate the whole job. The cap follows the bucket-cap pattern:
parts are truncated to their ``max_items_per_part`` lexicographically
smallest items (deterministic — no sampling), with the number of
truncated parts observable via an optional log. The join itself is a
self-equi-join on the part key — shuffle volume O(Σ min(k, cap)²), never
all-pairs across parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cooccurrence(
    incidence: DataFrame,
    part_col: str,
    item_col: str,
    max_items_per_part: int | None = 256,
    min_count: int = 1,
    log_skew: bool = False,
) -> DataFrame:
    """Project a two-mode ``(part, item)`` incidence onto item pairs.

    Returns ``(item_a, item_b, cnt)`` with ``item_a < item_b`` and
    ``cnt`` = number of distinct parts where both items appear (the
    unweighted bipartite projection). Duplicate ``(part, item)`` rows
    are collapsed first, so multiplicities within a part don't inflate
    counts.
    """
    inc = incidence.select(
        F.col(part_col).alias("part"), F.col(item_col).alias("item")
    ).distinct()
    if max_items_per_part is not None:
        w = Window.partitionBy("part").orderBy("item")
        ranked = inc.withColumn("_rk", F.row_number().over(w))
        if log_skew:
            over = (
                ranked.groupBy("part")
                .agg(F.max("_rk").alias("k"))
                .where(F.col("k") > max_items_per_part)
                .count()
            )
            if over:
                print(
                    f"cooccurrence: truncated {over} part(s) to "
                    f"{max_items_per_part} items"
                )
        inc = ranked.where(F.col("_rk") <= max_items_per_part).drop("_rk")
    left = inc.select("part", F.col("item").alias("item_a"))
    right = inc.select("part", F.col("item").alias("item_b"))
    pairs = left.join(right, "part").where(F.col("item_a") < F.col("item_b"))
    out = pairs.groupBy("item_a", "item_b").agg(F.count("*").alias("cnt"))
    if min_count > 1:
        out = out.where(F.col("cnt") >= min_count)
    return out


def tool_cooccurrence(
    transcripts: DataFrame,
    max_tools_per_conv: int | None = 256,
    min_count: int = 1,
) -> DataFrame:
    """Tool–tool co-occurrence over conversations: how often two tools
    were used in the same conversation. ``(item_a, item_b, cnt)``."""
    inc = transcripts.where(F.col("role") == "tool").select(
        "conv_id", F.col("tool").alias("item")
    )
    return cooccurrence(
        inc,
        "conv_id",
        "item",
        max_items_per_part=max_tools_per_conv,
        min_count=min_count,
    )


def butterfly_count(
    incidence: DataFrame,
    part_col: str,
    item_col: str,
    max_items_per_part: int | None = None,
) -> DataFrame:
    """One row ``(butterflies)``: number of butterflies (complete 2×2
    bicliques, the bipartite analogue of a 4-cycle) in the two-mode
    ``(part, item)`` graph — Σ over item pairs of C(w, 2) with ``w`` =
    common-part count, since every butterfly contains exactly one item
    pair. All-integer (the ``Σ w·(w−1) DIV 2`` is exact), so the DuckDB
    oracle hash-checks it. Cost = the projection join, Σ min(k, cap)²
    per part; pass ``max_items_per_part`` on hub-part-heavy data (a
    declared approximation, deterministic lexicographic truncation)."""
    co = cooccurrence(
        incidence,
        part_col,
        item_col,
        max_items_per_part=max_items_per_part,
    )
    return co.agg(
        F.expr("coalesce(sum(cnt * (cnt - 1)), 0) DIV 2")
        .cast("long")
        .alias("butterflies")
    )


# DuckDB oracle text ({SRC} = transcripts relation, {CAP} = per-part cap,
# {MIN} = min pair count) — same derivation, verbatim.
TOOL_COOCCURRENCE_SQL_TEMPLATE = """
WITH inc AS (
  SELECT DISTINCT conv_id AS part, tool AS item
  FROM {SRC} WHERE role = 'tool'
),
capped AS (
  SELECT part, item FROM (
    SELECT part, item,
           row_number() OVER (PARTITION BY part ORDER BY item) AS rk
    FROM inc
  ) WHERE rk <= {CAP}
)
SELECT a.item AS item_a, b.item AS item_b, count(*) AS cnt
FROM capped a JOIN capped b ON a.part = b.part AND a.item < b.item
GROUP BY a.item, b.item
HAVING count(*) >= {MIN}
"""


def frequent_itemsets(
    incidence: DataFrame,
    part_col: str,
    item_col: str,
    min_support: int = 2,
    max_items_per_part: int | None = 256,
) -> DataFrame:
    """A-priori frequent itemsets up to size 3 over a two-mode
    ``(part, item)`` incidence — the classic distributed market-basket
    pass (Agrawal & Srikant 1994), here for "which tool combinations
    recur across conversations".

    Support of an itemset = number of distinct parts containing ALL its
    items (duplicates collapsed, per-part item lists deterministically
    capped at ``max_items_per_part`` by item order — same bound as
    :func:`cooccurrence`). Returns ``(k, itemset, support)`` for every
    itemset of size 1-3 with ``support >= min_support``; ``itemset`` is
    the ``'|'``-joined sorted item list, so the result is hash-exact.

    Scale shape: the within-part pair enumeration (Σk² output from an
    input-linear list) runs in the salted pinned-partition wedge layout
    (``triangles.salted_wedge_pairs`` with the part kept — AQE's
    input-sized coalescing would fold it into 1-2 exploding tasks);
    the L3 extension join pins an explicit ``repartition(p, part)`` on
    both sides for the same reason. L3 extends each within-part
    frequent pair ``(a, b)`` with part items ``c > b``, both sides
    semi-joined against the BROADCAST frequent-pair/item sets first
    (the A-priori monotonicity prune — by downward closure the reported
    triples are exactly those with ``support >= min_support``, so the
    prune changes cost, never results, and a plain SQL 3-way-join
    oracle replays it). Frequent-set broadcasts are safe by
    construction: L1/L2 sizes are support-thresholded, and at 100 TB
    ``min_support`` scales with corpus size.
    """
    from .triangles import salted_wedge_pairs

    inc = incidence.select(
        F.col(part_col).alias("part"), F.col(item_col).alias("item")
    ).distinct()
    if max_items_per_part is not None:
        w = Window.partitionBy("part").orderBy("item")
        inc = (
            inc.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= max_items_per_part)
            .drop("_rk")
        )
    spark = inc.sparkSession
    p = max(int(spark.sparkContext.defaultParallelism), 8)

    l1 = (
        inc.groupBy("item")
        .agg(F.count("*").cast("long").alias("support"))
        .where(F.col("support") >= int(min_support))
    )
    inc1 = inc.join(F.broadcast(l1.select("item")), "item").select("part", "item")

    pairs_in_part = salted_wedge_pairs(
        inc1, center="part", endpoint="item", keep_center=True
    ).select("part", F.col("u").alias("ia"), F.col("v").alias("ib"))
    l2 = (
        pairs_in_part.groupBy("ia", "ib")
        .agg(F.count("*").cast("long").alias("support"))
        .where(F.col("support") >= int(min_support))
    )

    part_pairs = pairs_in_part.join(F.broadcast(l2.select("ia", "ib")), ["ia", "ib"])
    triples_in_part = (
        part_pairs.repartition(p, "part")
        .join(
            inc1.select("part", F.col("item").alias("ic")).repartition(p, "part"),
            "part",
        )
        .where(F.col("ic") > F.col("ib"))
    )
    # prune: (ia, ic) and (ib, ic) must also be frequent pairs
    triples_in_part = triples_in_part.join(
        F.broadcast(l2.select(F.col("ia"), F.col("ib").alias("ic"))),
        ["ia", "ic"],
    ).join(
        F.broadcast(l2.select(F.col("ia").alias("ib"), F.col("ib").alias("ic"))),
        ["ib", "ic"],
    )
    l3 = (
        triples_in_part.groupBy("ia", "ib", "ic")
        .agg(F.count("*").cast("long").alias("support"))
        .where(F.col("support") >= int(min_support))
    )

    out1 = l1.select(
        F.lit(1).cast("int").alias("k"), F.col("item").alias("itemset"), "support"
    )
    out2 = l2.select(
        F.lit(2).cast("int").alias("k"),
        F.concat_ws("|", "ia", "ib").alias("itemset"),
        "support",
    )
    out3 = l3.select(
        F.lit(3).cast("int").alias("k"),
        F.concat_ws("|", "ia", "ib", "ic").alias("itemset"),
        "support",
    )
    return out1.unionAll(out2).unionAll(out3)
