"""Synthetic benchmark graph generators (reference protocol analogue).

The reference benchmarks on generated graphs — G(n,p), Watts-Strogatz,
powerlaw-cluster at |V|=1e5, |E| up to 1e8
(``src/resources/python/graph_generator/generate_graph.py:59-106``,
``build/hw/run.py:13-47``). These generators produce the same role
fully distributed (``spark.range`` + hash arithmetic, deterministic,
no driver data): an edge table of arbitrary |V|/|E| for throughput and
scaling runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gnp_edges(
    spark: SparkSession,
    num_vertices: int,
    num_edges: int,
    seed: int = 42,
    skew: float = 0.0,
    partitions: int | None = None,
) -> DataFrame:
    """~G(n, m) directed edge table ``(src, dst, weight)``.

    ``skew`` ∈ [0, 1): fraction of edges whose dst is drawn from a tiny
    hub set (power-law-ish hot destinations, the skew-splitting stress
    case). Weights are 1/outdeg (loader semantics, utils.hpp:886-895).
    Duplicates are kept (they model multi-edges; dedup is the caller's
    choice) but self-loops are dropped on generation, like readMtx
    (``utils.hpp:599-608``).
    """
    p = partitions or spark.sparkContext.defaultParallelism
    e = spark.range(0, num_edges, 1, p)
    src = F.pmod(F.xxhash64("id", F.lit(seed), F.lit(1)), F.lit(num_vertices))
    dst_uniform = F.pmod(F.xxhash64("id", F.lit(seed), F.lit(2)), F.lit(num_vertices))
    if skew > 0:
        hub = F.pmod(F.xxhash64("id", F.lit(seed), F.lit(3)), F.lit(max(1, num_vertices // 10000)))
        is_hub = (
            F.pmod(F.xxhash64("id", F.lit(seed), F.lit(4)), F.lit(1000))
            < int(skew * 1000)
        )
        dst = F.when(is_hub, hub).otherwise(dst_uniform)
    else:
        dst = dst_uniform
    df = e.select(src.alias("src"), dst.alias("dst")).where(F.col("src") != F.col("dst"))
    w = Window.partitionBy("src")
    return df.select(
        "src", "dst", (F.lit(1.0) / F.count("*").over(w)).alias("weight")
    )
