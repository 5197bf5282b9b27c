"""Weakly connected components via iterative min-label propagation.

Mandated by the north rule (the reference's ``cc.gm`` is *closeness
centrality*, not components — ``src/cpu/src/main/resources/cc.gm:1-28``;
components here run on the same superstep machinery as PageRank with
``min`` replacing ``sum``).

Semantics: every vertex starts labeled with its own id; each superstep
every vertex takes the min of its own label and its neighbors' labels
(over the symmetrized edge set); fixpoint labels are the component ids
(= min vertex id in the component).

Modes mirror ``pagerank``: an Arrow broadcast kernel
(``np.minimum.reduceat`` over dst-sorted batches, one Spark job per
superstep) and a distributed DataFrame mode (join + ``groupBy(dst).min``)
for vertex states beyond driver memory. Iteration count is bounded by
the graph diameter; at web scale, switch-to large-star/small-star is a
known follow-up, noted in the module TODO.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from approximate_pagerank_public_spark.plans.checkpoint import (
    free_local_ckpt,
    local_ckpt,
)
from approximate_pagerank_public_spark.plans.graph import Graph

_MIN_SCHEMA = StructType(
    [StructField("dst", LongType()), StructField("lbl", LongType())]
)


def _min_partials(edges: DataFrame, load_labels) -> DataFrame:
    """Per-partition (dst, min incoming label) — vectorized, map-side combined."""

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        labels = load_labels()
        dsts: list[np.ndarray] = []
        lbls: list[np.ndarray] = []
        for b in batches:
            if b.num_rows == 0:
                continue
            src = b.column("src").to_numpy(zero_copy_only=False)
            dst = b.column("dst").to_numpy(zero_copy_only=False)
            incoming = labels[src]
            starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
            dsts.append(dst[starts])
            lbls.append(np.minimum.reduceat(incoming, starts))
        if not dsts:
            return
        dst_all = np.concatenate(dsts)
        lbl_all = np.concatenate(lbls)
        order = np.argsort(dst_all, kind="stable")
        dst_all, lbl_all = dst_all[order], lbl_all[order]
        starts = np.flatnonzero(np.r_[True, dst_all[1:] != dst_all[:-1]])
        yield pa.RecordBatch.from_arrays(
            [pa.array(dst_all[starts]), pa.array(np.minimum.reduceat(lbl_all, starts))],
            names=["dst", "lbl"],
        )

    return edges.mapInArrow(kernel, _MIN_SCHEMA)


def _cc_broadcast(graph: Graph, max_iter: int) -> tuple[np.ndarray, int]:
    from approximate_pagerank_public_spark.operators.spmv import _RankShip

    n = graph.num_vertices
    labels = np.arange(n, dtype=np.int64)
    blocks = graph.blocks
    if blocks is not None:
        # frontier-sparse min-label relaxation on the CSR blocks (the
        # BFS machinery with plus_one=False): supersteps touch only
        # edges whose src label improved last round, so a high-diameter
        # component costs O(frontier edges) per extra round instead of
        # a full edge pass
        from approximate_pagerank_public_spark.operators.traversal import (
            frontier_min_relax,
        )

        state = labels[:, None].copy()
        changed = np.ones(n, dtype=bool)
        out, rounds, converged = frontier_min_relax(
            graph, state, changed, plus_one=False, max_iters=max_iter
        )
        if not converged:
            import warnings

            warnings.warn(
                f"min-label propagation hit max_iter={max_iter} before "
                "fixpoint; labels may not be component minima",
                RuntimeWarning,
                stacklevel=2,
            )
        return out[:, 0], rounds
    for it in range(1, max_iter + 1):
        ship = _RankShip(graph.spark, labels)
        try:
            # partials are disjoint-ish across dst-partitioned edges;
            # driver-side minimum.at merge makes a shuffle unnecessary
            pdf = _min_partials(graph.edges, ship.load).toPandas()
        finally:
            ship.cleanup()
        new = labels.copy()
        idx = pdf["dst"].to_numpy(np.int64)
        np.minimum.at(new, idx, pdf["lbl"].to_numpy(np.int64))
        if np.array_equal(new, labels):
            return labels, it
        labels = new
    return labels, max_iter


def _cc_distributed(graph: Graph, max_iter: int) -> tuple[DataFrame, int]:
    spark = graph.spark
    p = graph.num_partitions
    labels = graph.vertices.withColumn("label", F.col("id"))
    labels, label_ids = local_ckpt(labels.repartition(p, "id"))
    for it in range(1, max_iter + 1):
        incoming = (
            graph.edges.join(
                labels.select(F.col("id").alias("src"), F.col("label")), "src"
            )
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        new, new_ids = local_ckpt(
            labels.join(incoming, labels.id == incoming.dst, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
            .repartition(p, "id")
        )
        changed = (
            new.join(labels.withColumnRenamed("label", "_old"), "id")
            .where(F.col("label") != F.col("_old"))
            .count()
        )
        free_local_ckpt(spark, label_ids)
        labels, label_ids = new, new_ids
        if changed == 0:
            return labels, it
    return labels, max_iter


def _cc_star_distributed(graph: Graph, max_rounds: int = 60) -> tuple[DataFrame, int]:
    """Large-star/small-star alternation (Kiveris et al., "Connected
    Components in MapReduce and Beyond") — converges in O(log n) rounds
    regardless of diameter, where min-label propagation needs
    O(diameter) supersteps (the r1 TODO: a path-shaped 100x graph is
    the first place min-prop falls over).

    Each round is joins + groupBy-min over the edge list — no
    collect_list, so hub neighborhoods never materialize in one task:

    - large-star: every node links its LARGER neighbors to
      ``m = min(Γ(u) ∪ {u})``;
    - small-star: every node links its smaller neighbors (and itself)
      to the minimum of its smaller neighborhood.

    Fixpoint (edge set stable, checked via count + order-independent
    xxhash aggregate) leaves star edges ``(v, root)``; labels read off
    directly. ``graph`` must already be symmetrized (undirected()).
    """
    spark = graph.spark
    p = graph.num_partitions
    e = graph.edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    roots, rounds = star_components_edges(spark, e, p, max_rounds)
    verts = graph.vertices
    labels = verts.join(roots, verts["id"] == roots["a"], "left").select(
        "id",
        F.least(F.col("id"), F.coalesce("r", F.col("id"))).alias("component"),
    )
    return labels, rounds


def star_components_edges(
    spark, pair_edges: DataFrame, num_partitions: int, max_rounds: int = 60
) -> tuple[DataFrame, int]:
    """Large-star/small-star alternation over an arbitrary undirected
    pair list ``(a, b)`` — the :func:`_cc_star_distributed` core, shared
    with non-graph callers (duplicate-cluster resolution runs it over
    near-dup DOC pairs, ``operators/dedup.py::duplicate_clusters``).

    Returns ``(roots, rounds)``: ``roots`` maps every NON-ROOT member to
    its component minimum; component minima and ids absent from the
    pairs are unmapped — callers resolve with
    ``least(id, coalesce(r, id))`` exactly as ``_cc_star_distributed``
    does. The per-round symmetrize makes edge orientation irrelevant
    (``a < b`` canonical pairs are fine)."""
    p = num_partitions
    e = pair_edges.select(F.col("a").cast("long"), F.col("b").cast("long"))
    e, e_ids = local_ckpt(e.repartition(p, "a"))

    def _sig(df: DataFrame) -> tuple[int, int]:
        # bit_xor: order-independent AND overflow-free (a sum of
        # xxhash64 values overflows long under ANSI-mode sessions,
        # e.g. plain spark-submit defaults)
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(a, b))"), F.lit(0)).alias("h"),
        ).first()
        return int(row["n"]), int(row["h"])

    sig = _sig(e)
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        # ---- large-star over the symmetrized current edge set
        sym = e.unionAll(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
        mins = sym.groupBy("a").agg(F.min("b").alias("mn"))
        mins = mins.select("a", F.least("a", "mn").alias("m"))
        ls = (
            sym.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        # ---- small-star on the min-oriented edges
        ori = ls.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        ).distinct()
        mins2 = ori.groupBy("a").agg(F.min("b").alias("m"))
        ss, ss_ids = local_ckpt(
            ori.join(mins2, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionAll(mins2.select(F.col("a"), F.col("m").alias("b")))
            .where(F.col("a") != F.col("b"))
            .distinct()
            .repartition(p, "a")
        )
        new_sig = _sig(ss)
        free_local_ckpt(spark, e_ids)
        e, e_ids = ss, ss_ids
        if new_sig == sig:
            break
        sig = new_sig
    else:  # pragma: no cover — max_rounds=60 >> O(log n) for any real graph
        import warnings

        warnings.warn(
            f"star CC exhausted max_rounds={max_rounds} without a stable "
            "(count, bit_xor) edge-set signature; labels may be from a "
            "non-converged edge set",
            RuntimeWarning,
            stacklevel=2,
        )
    roots = e.groupBy("a").agg(F.min("b").alias("r"))
    return roots, rounds


def connected_components(
    graph: Graph, max_iter: int = 200, mode: str = "auto"
) -> DataFrame:
    """``(id, component)`` over the symmetrized graph (weak components).

    ``mode``: ``broadcast`` (Arrow min-label kernel, O(diameter)
    supersteps), ``distributed`` (DataFrame min-prop twin), or ``star``
    (large-star/small-star, O(log n) rounds — the path-graph-safe choice
    for high-diameter graphs at any scale)."""
    und = graph.undirected()
    if mode == "auto":
        mode = "broadcast" if graph.num_vertices <= 100_000_000 else "distributed"
    try:
        if mode == "star":
            labels_df, _ = _cc_star_distributed(und)
            return labels_df
        if mode == "broadcast":
            labels, _ = _cc_broadcast(und, max_iter)
            import pandas as pd

            pdf = pd.DataFrame(
                {"id": np.arange(len(labels), dtype=np.int64), "component": labels}
            )
            return graph.spark.createDataFrame(pdf)
        labels_df, _ = _cc_distributed(und, max_iter)
        return labels_df.withColumnRenamed("label", "component")
    finally:
        und.unpersist()


def component_sizes(components: DataFrame) -> DataFrame:
    return components.groupBy("component").agg(F.count("*").alias("size"))
