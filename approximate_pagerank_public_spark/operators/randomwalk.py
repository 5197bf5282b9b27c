"""Monte-Carlo random-walk personalized PageRank.

The reference approximates PPR by truncating the power iteration
(iteration budget + L1 early exit, ``multi_personalized_pagerank.cpp``);
the other classic approximation family — the one used at web scale when
even one |E|-pass per iteration is too much — simulates α-terminated
random walks from the source and estimates PPR(v) by the fraction of
walks that END at v (Fogaras et al., "Towards Scaling Fully Personalized
PageRank", 2005; Avrachenkov et al. 2007 for the endpoint estimator).

Everything random is derandomized through md5 so the walk ensemble is
reproducible across engines (the DuckDB oracle replays it exactly):

- per (walk ``w``, step ``t``): ``r = int(md5(f"{seed}:{w}:{t}")[:15], 16)``
  (60 bits — fits a signed i64 in Spark and a UBIGINT in DuckDB);
- terminate when ``r % 100 >= continue_pct`` (α=0.8 → 80) or the
  current vertex is dangling, else hop to out-neighbor
  ``(r // 100) % outdeg`` in dst-sorted adjacency order;
- walks are truncated at ``walk_length`` steps (the tail mass beyond L
  is α^L — the estimator's declared bias, same spirit as the
  reference's fixed iteration budget).

Distributed shape (the 100-TB path): walk state is a DataFrame
``(walk, cur, stopped)`` of W rows; each step is one equi-join against
the ranked adjacency ``(src, rnk, dst)`` — shuffle volume O(W) per step,
independent of |E|, and W walks spread across the cluster. Lineage is
truncated via ``local_ckpt`` every few steps. No driver-side state at
any point; the W→∞ scale axis is embarrassingly parallel.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from approximate_pagerank_public_spark.plans.checkpoint import (
    free_local_ckpt,
    local_ckpt,
)
from approximate_pagerank_public_spark.plans.graph import Graph

_CKPT_EVERY = 4  # join-lineage truncation cadence


def _step_hash(seed: str, walk_col: str, t: int) -> F.Column:
    """60-bit deterministic per-(walk, step) draw, identical in DuckDB:
    ``CAST('0x' || substring(md5(seed:w:t), 1, 15) AS UBIGINT)``."""
    payload = F.concat_ws(":", F.lit(seed), F.col(walk_col), F.lit(str(t)))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def ranked_adjacency(g: Graph) -> DataFrame:
    """(src, rnk, dst, deg): out-neighbors indexed 0..deg-1 in dst order.

    The per-src window is safe at scale: it partitions BY src (hash
    shuffle, no global sort), and a web-graph hub's out-degree — unlike
    its in-degree — is crawl-bounded, so per-partition state stays small.
    """
    w = Window.partitionBy("src").orderBy("dst")
    return g.edges.select("src", "dst").withColumn(
        "rnk", F.row_number().over(w) - 1
    ).withColumn("deg", F.count("*").over(Window.partitionBy("src")))


@dataclass
class RandomWalkResult:
    num_walks: int
    walk_length: int
    _df: DataFrame

    def endpoints(self) -> DataFrame:
        """(id, endpoints, ppr_hat) — visit mass of walk ENDPOINTS."""
        return self._df


def random_walk_ppr(
    g: Graph,
    source: int,
    num_walks: int = 256,
    walk_length: int = 12,
    alpha: float = 0.8,
    seed: str = "mc",
) -> RandomWalkResult:
    """α-terminated endpoint-estimator MC PPR from ``source``.

    ``alpha`` is the continuation probability — the same α as the
    reference's PPR damping (``options.hpp:20``), quantized to integer
    percent so the md5 draw decides identically in both engines.
    """
    spark = g.spark
    continue_pct = int(round(alpha * 100))
    adj = ranked_adjacency(g)

    state = spark.range(num_walks).select(
        F.col("id").alias("walk"),
        F.lit(int(source)).cast("long").alias("cur"),
        F.lit(False).alias("stopped"),
    )
    ckpt_ids: set[int] = set()
    for t in range(walk_length):
        s = state.withColumn("hv", _step_hash(seed, "walk", t))
        s = s.withColumn(
            "terminate",
            F.col("stopped") | (F.col("hv") % 100 >= F.lit(continue_pct)),
        ).withColumn("pick", F.expr("hv div 100"))
        # plan-level aliases: state's `cur` lineage traces back to adj's
        # `dst` from the previous step, so dataset-column references would
        # be ambiguous on the re-join (Spark's failAmbiguousSelfJoin)
        nxt = (
            s.alias("w")
            .join(
                adj.alias("a"),
                (F.col("w.cur") == F.col("a.src"))
                & ((F.col("w.pick") % F.col("a.deg")) == F.col("a.rnk"))
                & ~F.col("w.terminate"),
                "left",
            )
            .select(
                F.col("w.walk").alias("walk"),
                F.coalesce(F.col("a.dst"), F.col("w.cur")).alias("cur"),
                # dangling (no adjacency match while trying to move) stops too
                (F.col("w.terminate") | F.col("a.dst").isNull()).alias("stopped"),
            )
        )
        if (t + 1) % _CKPT_EVERY == 0 or t == walk_length - 1:
            nxt, new_ids = local_ckpt(nxt)
            if ckpt_ids:
                free_local_ckpt(spark, ckpt_ids)
            ckpt_ids = new_ids
        state = nxt

    out = (
        state.groupBy(F.col("cur").alias("id"))
        .agg(F.count("*").alias("endpoints"))
        .select(
            "id",
            "endpoints",
            (F.col("endpoints") / F.lit(float(num_walks))).alias("ppr_hat"),
        )
    )
    return RandomWalkResult(num_walks=num_walks, walk_length=walk_length, _df=out)


def random_walk_corpus(
    g: Graph,
    walks_per_vertex: int = 1,
    walk_length: int = 8,
    seed: str = "rw",
) -> DataFrame:
    """``(walk, step, vertex)`` — fixed-length random-walk trajectories
    from EVERY vertex (DeepWalk/node2vec-style corpus for embedding
    training, minus the p/q bias). Walk ``w = start · K + k`` hops to
    out-neighbor ``md5(seed:w:t) % outdeg`` in dst-sorted adjacency
    order; a dangling vertex pads the remaining steps in place (the
    trajectory keeps its fixed length — documented, SQL-replayable).

    Scale shape: state is ``(walk, cur)`` of V·K rows; each step one
    equi-join against the ranked adjacency (shuffle O(V·K), independent
    of |E|), lineage truncated via ``local_ckpt``; the corpus is the
    union of the L+1 per-step snapshots. md5 derandomization makes the
    corpus bit-reproducible across engines — the DuckDB oracle replays
    every hop.
    """
    spark = g.spark
    k = int(walks_per_vertex)
    adj = ranked_adjacency(g)
    state = (
        g.vertices.select(F.col("id").alias("cur"))
        .crossJoin(spark.range(k).select(F.col("id").alias("k")))
        .select((F.col("cur") * k + F.col("k")).alias("walk"), "cur")
    )
    steps = [state.withColumn("step", F.lit(0).cast("long"))]
    for t in range(walk_length):
        s = state.withColumn("hv", _step_hash(seed, "walk", t))
        nxt = (
            s.alias("w")
            .join(
                adj.alias("a"),
                (F.col("w.cur") == F.col("a.src"))
                & ((F.col("w.hv") % F.col("a.deg")) == F.col("a.rnk")),
                "left",
            )
            .select(
                F.col("w.walk").alias("walk"),
                F.coalesce(F.col("a.dst"), F.col("w.cur")).alias("cur"),
            )
        )
        # every per-step snapshot IS part of the corpus, so NO step
        # checkpoint is ever superseded — none may be freed (the blocks
        # are the only copy once lineage is truncated)
        nxt, _ids = local_ckpt(nxt)
        state = nxt
        steps.append(state.withColumn("step", F.lit(t + 1).cast("long")))
    out = steps[0]
    for s in steps[1:]:
        out = out.unionAll(s)
    return out.select("walk", "step", F.col("cur").alias("vertex"))


def node2vec_corpus(
    g: Graph,
    walk_length: int = 8,
    w_return: int = 1,
    w_in: int = 4,
    w_out: int = 2,
    seed: str = "n2v",
) -> DataFrame:
    """``(walk, step, vertex)`` — SECOND-ORDER biased walks from every
    vertex (node2vec, Grover & Leskovec 2016), md5-derandomized.

    The p/q bias is expressed as INTEGER weights over the three
    candidate classes relative to the previous vertex ``prev``:
    ``w_return`` for ``next == prev`` (node2vec weight 1/p),
    ``w_in`` for ``next`` with a directed edge ``prev → next``
    (distance-1 class, weight 1), ``w_out`` otherwise (1/q). Integer
    weights make the inverse-CDF draw exact: candidates are laid out in
    dst-ranked order, the 60-bit md5 draw reduces mod the weight total,
    and the picked candidate is the cumulative-weight bracket containing
    the draw — every step replays verbatim in DuckDB SQL (no floats
    anywhere). The distance-1 test uses the DIRECTED edge set (the walk
    itself follows out-edges); defaults (1, 4, 2) ≡ p=4, q=2 at L=4.

    Step 0 sets ``prev = start``: every out-neighbor of the start is
    then distance-1 (edge ``start → next`` exists by construction), so
    the first hop is uniform — the standard node2vec convention.
    Dangling vertices pad in place, keeping trajectories fixed-length
    like :func:`random_walk_corpus`.

    Scale shape: per step ONE equi-join expands the frontier to
    candidate rows (O(W·avg_deg)), a per-walk window cumsums the integer
    weights (partitioned by walk — never wider than one vertex's
    out-degree), one more hash join tags the distance-1 class. State is
    (walk, prev, cur); lineage is checkpointed per step because every
    per-step snapshot IS corpus output.
    """
    spark = g.spark
    adj = ranked_adjacency(g)
    e2 = g.edges.select(F.col("src").alias("p_src"), F.col("dst").alias("p_dst"))
    state = g.vertices.select(
        F.col("id").alias("walk"), F.col("id").alias("prev"), F.col("id").alias("cur")
    )
    steps = [state.select("walk", F.lit(0).cast("long").alias("step"), F.col("cur"))]
    for t in range(walk_length):
        cand = (
            state.alias("w")
            .join(adj.alias("a"), F.col("w.cur") == F.col("a.src"))
            .join(
                e2,
                (F.col("p_src") == F.col("w.prev"))
                & (F.col("p_dst") == F.col("a.dst")),
                "left",
            )
            .select(
                F.col("w.walk").alias("walk"),
                F.col("a.dst").alias("dst"),
                F.col("a.rnk").alias("rnk"),
                F.when(F.col("a.dst") == F.col("w.prev"), F.lit(int(w_return)))
                .when(F.col("p_src").isNotNull(), F.lit(int(w_in)))
                .otherwise(F.lit(int(w_out)))
                .cast("long")
                .alias("wt"),
            )
        )
        win = Window.partitionBy("walk").orderBy("rnk")
        cum = cand.select(
            "walk",
            "dst",
            "wt",
            F.sum("wt").over(win).alias("cw"),
            F.sum("wt").over(Window.partitionBy("walk")).alias("tot"),
        )
        draw = _step_hash(seed, "walk", t) % F.col("tot")
        pick = cum.where(
            ((F.col("cw") - F.col("wt")) <= draw) & (draw < F.col("cw"))
        ).select("walk", F.col("dst").alias("nxt"))
        nxt = (
            state.alias("w")
            .join(pick.alias("p"), "walk", "left")
            .select(
                F.col("walk"),
                F.col("w.cur").alias("prev"),
                F.coalesce(F.col("p.nxt"), F.col("w.cur")).alias("cur"),
            )
        )
        nxt, _ids = local_ckpt(nxt)
        state = nxt
        steps.append(
            state.select("walk", F.lit(t + 1).cast("long").alias("step"), F.col("cur"))
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionAll(s)
    return out.select("walk", "step", F.col("cur").alias("vertex"))


def skipgram_pairs(corpus: DataFrame, window: int = 2) -> DataFrame:
    """``(center, context, n)`` — word2vec-style training pairs from a
    walk corpus ``(walk, step, vertex)``: every ordered pair of vertices
    within ``window`` steps of each other on the same walk, counted.
    One self-equi-join on ``walk`` (bounded expansion ≤ 2·window rows
    per position) and a map-side-combinable count."""
    a = corpus.select(
        F.col("walk"), F.col("step").alias("s1"), F.col("vertex").alias("center")
    )
    b = corpus.select(
        F.col("walk"), F.col("step").alias("s2"), F.col("vertex").alias("context")
    )
    return (
        a.join(b, "walk")
        .where(
            (F.abs(F.col("s2") - F.col("s1")) <= F.lit(int(window)))
            & (F.col("s1") != F.col("s2"))
        )
        .groupBy("center", "context")
        .agg(F.count("*").alias("n"))
    )
