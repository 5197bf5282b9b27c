"""GNN training-data sampling: neighbor fanout sampling, k-hop blocks,
and skip-gram negative sampling.

GraphSAGE-style mini-batch construction (Hamilton et al. 2017) is the
operation that turns a link graph into GNN training data: for a batch of
root vertices, sample a bounded fan of in-neighbors per hop so the block
size is Π fanouts per root — independent of hub degrees. The sibling of
``operators/features.py`` (which aggregates FULL neighborhoods).

Everything random is md5-derandomized (the discipline of
``operators/randomwalk.py``): the per-edge draw is

    draw(src, dst) = int(md5(f"{seed}:{src}:{dst}")[:15], 16)

and a vertex's sample is its ``k`` in-edges with the smallest
``(draw, src)`` — deterministic, partition-count-independent, and
replayable verbatim in DuckDB (``CAST('0x' || substring(md5(..),1,15)
AS UBIGINT)``), so the whole sampled block is hash-exact cross-engine.

Scale shape: each hop restricts the edge table to the current frontier
FIRST (an equi-join on dst — broadcast while the frontier is small,
shuffle-hash beyond), then ranks inside the restricted set with one
window per (root, dst). Per-hop shuffle volume is O(frontier in-degree
mass), never O(|E|·hops); a mega-hub root costs one task's sort, and
the emitted block is ≤ batch·Π fanouts rows by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _edge_draw(seed: str) -> F.Column:
    """60-bit integer md5 draw per (src, dst) edge."""
    payload = F.concat_ws(":", F.lit(seed), F.col("src"), F.col("dst"))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def sample_in_neighbors(
    edges: DataFrame, k: int, seed: str = "gnn"
) -> DataFrame:
    """Per dst, the ``k`` in-edges with the smallest ``(draw, src)`` —
    a deterministic uniform-without-replacement sample of each vertex's
    in-neighborhood (md5 order is independent of id assignment).
    Returns ``(src, dst)``."""
    w = Window.partitionBy("dst").orderBy("_draw", "src")
    return (
        edges.select("src", "dst", _edge_draw(seed).alias("_draw"))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("src", "dst")
    )


def khop_sample(
    edges: DataFrame,
    roots: list[int],
    fanouts: list[int],
    seed: str = "gnn",
) -> DataFrame:
    """Sampled k-hop in-neighborhood blocks for a batch of roots:
    ``(root, hop, src, dst)`` — hop ``h`` rows are the sampled in-edges
    of hop ``h−1``'s sampled sources (hop 1 expands the roots).

    The per-(root, dst) rank uses the same global edge draw, so a
    vertex reached from two roots samples the SAME neighbors (cache-
    friendly and replayable); rows are distinct per (root, hop, edge).
    Block size ≤ |roots|·Π fanouts; a frontier vertex reached at two
    hops re-expands only at its first (smallest) hop.
    """
    spark = edges.sparkSession
    frontier = spark.createDataFrame(
        [(int(r), int(r)) for r in roots], "root int, id int"
    )
    seen = frontier  # (root, id) already expanded or queued
    out = None
    e = edges.select("src", "dst", _edge_draw(seed).alias("_draw"))
    for hop, k in enumerate(fanouts, start=1):
        cand = frontier.join(
            e, frontier["id"] == e["dst"], "inner"
        ).select("root", "src", "dst", "_draw")
        w = Window.partitionBy("root", "dst").orderBy("_draw", "src")
        block = (
            cand.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k)
            .select("root", F.lit(hop).alias("hop"), "src", "dst")
        )
        out = block if out is None else out.unionAll(block)
        nxt = (
            block.select("root", F.col("src").alias("id"))
            .distinct()
            .join(seen, ["root", "id"], "left_anti")
        )
        frontier = nxt
        seen = seen.unionAll(nxt)
    return out


def negative_samples(
    pairs: DataFrame,
    n_vertices: int,
    n_neg: int = 2,
    seed: str = "neg",
) -> DataFrame:
    """word2vec-style negative sampling over positive skip-gram pairs:
    every ``(center, context)`` positive emits ``n_neg`` uniform
    negatives ``md5(seed:center:context:j) % n_vertices`` with
    ``label = 0`` alongside the positive (``label = 1``). Accidental
    draws of a true context are kept (standard word2vec behavior — at
    corpus scale the 1/N hit rate is noise), which keeps the op a pure
    map: no join, no shuffle, exactly |pairs|·(1+n_neg) output rows.

    Output ``(center, context, label)`` — all-integer, hash-exact."""
    pos = pairs.select(
        "center", "context", F.lit(1).alias("label")
    )
    j = F.explode(F.sequence(F.lit(0), F.lit(n_neg - 1))).alias("j")
    payload = F.concat_ws(
        ":", F.lit(seed), F.col("center"), F.col("context"), F.col("j")
    )
    draw = F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")
    neg = (
        pairs.select("center", "context", j)
        .select(
            "center",
            (draw % F.lit(n_vertices)).cast("int").alias("context"),
            F.lit(0).alias("label"),
        )
    )
    return pos.unionAll(neg)


def weighted_negative_samples(
    pairs: DataFrame,
    degrees: DataFrame,
    n_neg: int = 2,
    seed: str = "wneg",
    deg_cap: int = 200_000,
) -> DataFrame:
    """word2vec-faithful negative sampling: negatives drawn from the
    unigram^0.75 noise distribution (Mikolov et al. 2013) over vertex
    degree instead of uniformly.

    Determinism across engines: ``w_v = ⌊√⌊√(min(deg,cap)³)⌋⌋`` —
    libm ``pow`` is NOT bit-standardized, but IEEE ``sqrt`` is
    correctly rounded everywhere and ``cap³ < 2^53`` stays exactly
    representable, so the integer slot weights replay bit-exactly in
    DuckDB. Each vertex owns ``w_v`` slots ``[lo_v, lo_v + w_v)`` with
    ``lo`` the exclusive cumsum of ``w`` in id order; a draw is
    ``md5(seed:center:context:j) % W`` matched by slot EQUI-join —
    word2vec's actual table-lookup sampler, distributed.

    Scale shape: the cumsum is partition-parallel (range repartition by
    id + per-partition window + broadcast driver offsets — the
    ``densify_vertices`` pattern, no global single-partition window);
    the slot table has ``W = Σ deg^0.75 ≤ Σ deg = 2|E|`` rows and the
    draw join keys are uniform by construction (no skew). Zero-degree
    vertices own no slots and are never drawn (word2vec never samples
    unseen words). Output ``(center, context, label)``, all-integer.
    """
    from pyspark.sql.window import Window

    spark = pairs.sparkSession
    d = F.least(F.col("degree"), F.lit(int(deg_cap))).cast("double")
    w_col = F.floor(
        F.sqrt(F.floor(F.sqrt(d * d * d)).cast("double"))
    ).cast("long")
    weighted = (
        degrees.where(F.col("degree") > 0)
        .select(F.col("id"), w_col.alias("w"))
        .where(F.col("w") > 0)
    )
    p = max(1, spark.sparkContext.defaultParallelism)
    ranged = (
        weighted.repartitionByRange(p, "id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()  # re-sampled range boundaries must not shift slots
    )
    sums = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid").agg(F.sum("w").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid])
    total_w = acc
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    win = Window.partitionBy("_pid").orderBy("id")
    slots = (
        ranged.join(F.broadcast(off_df), "_pid")
        .select(
            "id",
            (F.sum("w").over(win) - F.col("w") + F.col("_off")).alias("lo"),
            "w",
        )
        .select(
            F.explode(
                F.sequence(F.col("lo"), F.col("lo") + F.col("w") - 1)
            ).alias("slot"),
            F.col("id").alias("neg_id"),
        )
    )
    pos = pairs.select("center", "context", F.lit(1).alias("label"))
    j = F.explode(F.sequence(F.lit(0), F.lit(n_neg - 1))).alias("j")
    payload = F.concat_ws(
        ":", F.lit(seed), F.col("center"), F.col("context"), F.col("j")
    )
    draw = F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")
    neg = (
        pairs.select("center", "context", j)
        .select("center", (draw % F.lit(total_w)).alias("slot"))
        .join(slots, "slot")
        .select(
            "center",
            F.col("neg_id").cast("int").alias("context"),
            F.lit(0).alias("label"),
        )
    )
    return pos.unionAll(neg)
