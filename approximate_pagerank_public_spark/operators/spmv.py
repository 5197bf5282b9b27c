"""Sparse gather-scatter (SpMV) supersteps — the engine's inner loop.

Semantics (reference ``spmv_gold``, ``src/fpga/src/gold_algorithms.hpp:3-16``):
``contrib[v] = Σ_{(u,v)∈E} weight(u,v) · rank[u]`` — i.e.
``SELECT dst, SUM(weight * rank[src]) GROUP BY dst`` in pull orientation.

Two physical strategies, selected by vertex-state size:

1. **Arrow broadcast kernel** (:func:`gather_contrib`) — the north-star
   path. The rank vector (or an (S,N) block for S simultaneous sources,
   mirroring the FPGA's 8-query batching,
   ``src/fpga/src/ip_cores/multi_personalized_pagerank.cpp:157-166``) is
   broadcast to executors; a ``mapInArrow`` kernel streams each edge
   partition's dst-sorted Arrow batches through vectorized NumPy:
   fancy-index gather (the reference's ``scatter_vec``,
   ``spmv_coo.hpp:10-41``) + ``np.add.reduceat`` segmented reduction
   (the reference's streaming write-back FSM,
   ``spmv_coo_multi_stream.hpp:178-232``). Each partition emits exactly
   one partial sum per distinct dst — map-side combine — so the final
   ``groupBy(dst)`` shuffle moves O(P × distinct dst) rows, not O(E).
   No per-row Python anywhere.

2. **Distributed DataFrame gather** (:func:`gather_contrib_df`) — for
   vertex states too large to broadcast (the 10^12-turn regime): an
   equi-join of edges with a co-partitioned rank DataFrame followed by
   partial+final hash aggregation; AQE skew-join splitting handles hot
   join keys, and Spark's partial aggregation handles hot dst groups.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from approximate_pagerank_public_spark.plans.graph import Graph


def _contrib_schema(n_sources: int) -> StructType:
    return StructType(
        [StructField("dst", LongType())]
        + [StructField(f"c{i}", DoubleType()) for i in range(n_sources)]
    )


def _segmented_sum(
    dst: np.ndarray, contrib: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Sum runs of equal dst. Correct for any order (more rows if
    unsorted); dst-sorted input → one row per distinct dst."""
    starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
    return dst[starts], np.add.reduceat(contrib, starts, axis=1)


def spmv_partials(edges: DataFrame, rank_bc, n_sources: int) -> DataFrame:
    """Per-partition partial sums ``(dst, c0..c{S-1})`` via the Arrow kernel."""

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        rank = rank_bc.value  # (S, N) float64
        dsts: list[np.ndarray] = []
        parts: list[np.ndarray] = []
        for b in batches:
            if b.num_rows == 0:
                continue
            src = b.column("src").to_numpy(zero_copy_only=False)
            dst = b.column("dst").to_numpy(zero_copy_only=False)
            w = b.column("weight").to_numpy(zero_copy_only=False)
            contrib = rank[:, src] * w  # vectorized gather + multiply, (S, Eb)
            u, p = _segmented_sum(dst, contrib)
            dsts.append(u)
            parts.append(p)
        if not dsts:
            return
        # second-level combine across this partition's batches
        dst_all = np.concatenate(dsts)
        part_all = np.concatenate(parts, axis=1)
        order = np.argsort(dst_all, kind="stable")
        u, p = _segmented_sum(dst_all[order], part_all[:, order])
        arrays = [pa.array(u)] + [pa.array(np.ascontiguousarray(p[i])) for i in range(p.shape[0])]
        yield pa.RecordBatch.from_arrays(
            arrays, names=["dst"] + [f"c{i}" for i in range(p.shape[0])]
        )

    return edges.mapInArrow(kernel, _contrib_schema(n_sources))


def gather_contrib(graph: Graph, rank: np.ndarray) -> np.ndarray:
    """One superstep gather: ``contrib = W^T · rank`` as an (S, N) array.

    One Spark job: kernel → final merge ``groupBy(dst)`` → Arrow collect.
    Missing dsts (no in-edges) are implicit zeros — the reason the
    reference pads zero self-loops (``coo_fpga.hpp:32-44``) and we don't
    need to.
    """
    rank2d = np.ascontiguousarray(np.atleast_2d(np.asarray(rank, dtype=np.float64)))
    n_sources = rank2d.shape[0]
    bc = graph.spark.sparkContext.broadcast(rank2d)
    try:
        partials = spmv_partials(graph.edges, bc, n_sources)
        agg = partials.groupBy("dst").agg(
            *[F.sum(f"c{i}").alias(f"c{i}") for i in range(n_sources)]
        )
        pdf = agg.toPandas()
    finally:
        bc.destroy()
    contrib = np.zeros((n_sources, graph.num_vertices), dtype=np.float64)
    if len(pdf):
        idx = pdf["dst"].to_numpy(np.int64)
        for i in range(n_sources):
            contrib[i, idx] = pdf[f"c{i}"].to_numpy(np.float64)
    return contrib


def gather_contrib_df(graph: Graph, ranks: DataFrame, rank_col: str = "rank") -> DataFrame:
    """Distributed gather: ``(dst, contrib)`` DataFrame.

    ``ranks`` must be ``(id, <rank_col>)``. The join shuffles edges by
    ``src`` (or broadcasts ranks when small — Catalyst/AQE decides from
    stats); the aggregation does map-side partial sums before the final
    ``dst`` shuffle.
    """
    r = ranks.select(F.col("id").alias("src"), F.col(rank_col).alias("_r"))
    return (
        graph.edges.join(r, "src")
        .groupBy("dst")
        .agg(F.sum(F.col("weight") * F.col("_r")).alias("contrib"))
    )
