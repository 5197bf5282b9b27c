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


def _u01(seed: int, *salts: int) -> F.Column:
    """Deterministic uniform [0,1) from row id + salts (hash arithmetic,
    fully distributed — no RNG state)."""
    h = F.pmod(F.xxhash64("id", F.lit(seed), *[F.lit(s) for s in salts]), F.lit(1 << 32))
    return h / F.lit(float(1 << 32))


def watts_strogatz_edges(
    spark: SparkSession,
    num_vertices: int,
    k: int = 200,
    p_rewire: float = 0.2,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Watts–Strogatz small-world graph, the reference's ``smw`` family
    (``generate_graph.py:79-84``: nx.watts_strogatz_graph(k=200, p=.2)).

    Ring lattice: vertex ``i`` connects to ``i+1 .. i+k/2`` (mod n);
    each lattice edge is rewired to a uniform target with probability
    ``p_rewire``. Symmetrized (both directions emitted), 1/outdeg
    weights — deterministic in ``seed``, generated distributed from
    ``spark.range`` hash arithmetic.
    """
    half = max(1, k // 2)
    p = partitions or spark.sparkContext.defaultParallelism
    e = spark.range(0, num_vertices * half, 1, p)
    i = (F.col("id") / half).cast("long")
    j = F.pmod(F.col("id"), F.lit(half)) + 1
    lattice = F.pmod(i + j, F.lit(num_vertices))
    rnd = F.pmod(
        F.xxhash64("id", F.lit(seed), F.lit(11)), F.lit(num_vertices)
    )
    rewired = F.when(_u01(seed, 10) < F.lit(float(p_rewire)), rnd).otherwise(lattice)
    fwd = e.select(i.alias("src"), rewired.alias("dst")).where(
        F.col("src") != F.col("dst")
    )
    sym = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    w = Window.partitionBy("src")
    return sym.select(
        "src", "dst", (F.lit(1.0) / F.count("*").over(w)).alias("weight")
    )


def powerlaw_cluster_edges(
    spark: SparkSession,
    num_vertices: int,
    num_edges: int,
    p_triad: float = 0.1,
    bias: float = 2.0,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Triangle-rich heavy-tail graph — the protocol role of the
    reference's ``pc`` family (nx.powerlaw_cluster_graph(m=1000, p=.1),
    ``generate_graph.py:85-95``), i.e. Holme–Kim: preferential
    attachment plus triad closure.

    Distributed deterministic stand-in: each generator row builds a
    wedge ``(s,d1), (s,d2)`` with heavy-tail dst draws (same inverse-CDF
    tail as :func:`powerlaw_edges`) and closes it into a triangle
    ``(d1,d2)`` with probability ``p_triad`` — so clustering is tunable
    independently of the degree tail, which is exactly what the pc
    family adds over plain scale-free. ~``num_edges`` edges total;
    self-loops dropped; 1/outdeg weights; deterministic in ``seed``.
    """
    p = partitions or spark.sparkContext.defaultParallelism
    rows = max(1, int(num_edges / (2.0 + p_triad)))
    e = spark.range(0, rows, 1, p)
    s = F.pmod(F.xxhash64("id", F.lit(seed), F.lit(31)), F.lit(num_vertices))
    d1 = F.floor(
        F.lit(float(num_vertices)) * F.pow(_u01(seed, 32), F.lit(float(bias)))
    ).cast("long")
    d2 = F.floor(
        F.lit(float(num_vertices)) * F.pow(_u01(seed, 33), F.lit(float(bias)))
    ).cast("long")
    close = _u01(seed, 34) < F.lit(float(p_triad))
    wedges = e.select(
        s.alias("s"), d1.alias("d1"), d2.alias("d2"), close.alias("close")
    )
    df = (
        wedges.select(F.col("s").alias("src"), F.col("d1").alias("dst"))
        .unionAll(wedges.select(F.col("s").alias("src"), F.col("d2").alias("dst")))
        .unionAll(
            wedges.where("close").select(
                F.col("d1").alias("src"), F.col("d2").alias("dst")
            )
        )
        .where(F.col("src") != F.col("dst"))
    )
    w = Window.partitionBy("src")
    return df.select(
        "src", "dst", (F.lit(1.0) / F.count("*").over(w)).alias("weight")
    )


def scale_free_edges(
    spark: SparkSession,
    num_vertices: int,
    num_edges: int,
    alpha: float = 0.05,
    beta: float = 0.9,
    gamma: float = 0.05,
    bias: float = 2.0,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Directed scale-free graph — the reference's ``scf`` family
    (``nx.scale_free_graph(alpha=.05, beta=.9, gamma=.05)``,
    ``generate_graph.py:96-106``), which is heavy-tailed in BOTH in- and
    out-degree.

    Distributed stand-in for the sequential preferential-attachment
    process: each edge picks a branch by the α/β/γ mixture —
    α: uniform src → attractive (heavy-tail) dst;
    β: hub (heavy-tail) src → attractive dst;
    γ: hub src → uniform dst —
    with heavy endpoints drawn by the same inverse-CDF tail as
    :func:`powerlaw_edges`. Deterministic in ``seed``; self-loops
    dropped; 1/outdeg weights.
    """
    p = partitions or spark.sparkContext.defaultParallelism
    e = spark.range(0, num_edges, 1, p)
    nv = F.lit(float(num_vertices))
    heavy_src = F.floor(nv * F.pow(_u01(seed, 41), F.lit(float(bias)))).cast("long")
    heavy_dst = F.floor(nv * F.pow(_u01(seed, 42), F.lit(float(bias)))).cast("long")
    uni_src = F.pmod(F.xxhash64("id", F.lit(seed), F.lit(43)), F.lit(num_vertices))
    uni_dst = F.pmod(F.xxhash64("id", F.lit(seed), F.lit(44)), F.lit(num_vertices))
    branch = _u01(seed, 45)
    src = F.when(branch < F.lit(float(alpha)), uni_src).otherwise(heavy_src)
    dst = F.when(
        branch < F.lit(float(alpha + beta)), heavy_dst
    ).otherwise(uni_dst)
    df = e.select(src.alias("src"), dst.alias("dst")).where(
        F.col("src") != F.col("dst")
    )
    w = Window.partitionBy("src")
    return df.select(
        "src", "dst", (F.lit(1.0) / F.count("*").over(w)).alias("weight")
    )


def powerlaw_edges(
    spark: SparkSession,
    num_vertices: int,
    num_edges: int,
    bias: float = 2.0,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Power-law in-degree graph — the protocol role of the reference's
    ``pc``/``scf`` families (nx.powerlaw_cluster_graph(m=1000, p=.1),
    nx.scale_free_graph; ``generate_graph.py:85-106``). Preferential
    attachment is inherently sequential, so this uses the standard
    distributed stand-in: dst = ``floor(n · u^bias)`` — inverse-CDF
    sampling with density ∝ x^(1/bias - 1), i.e. the BA-like heavy
    tail at ``bias=2`` (hub mass on low vertex ids). Deterministic in
    ``seed``; self-loops dropped; 1/outdeg weights.
    """
    p = partitions or spark.sparkContext.defaultParallelism
    e = spark.range(0, num_edges, 1, p)
    src = F.pmod(F.xxhash64("id", F.lit(seed), F.lit(21)), F.lit(num_vertices))
    dst = F.floor(F.lit(float(num_vertices)) * F.pow(_u01(seed, 22), F.lit(float(bias)))).cast(
        "long"
    )
    df = e.select(src.alias("src"), dst.alias("dst")).where(F.col("src") != F.col("dst"))
    w = Window.partitionBy("src")
    return df.select(
        "src", "dst", (F.lit(1.0) / F.count("*").over(w)).alias("weight")
    )
