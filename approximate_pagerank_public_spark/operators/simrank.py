"""SimRank structural similarity (Jeh & Widom, KDD 2002).

``s(a,b) = C / (|I(a)|·|I(b)|) · Σ_{i∈I(a), j∈I(b)} s(i,j)`` with
``s(v,v) = 1`` — "two objects are similar if they are referenced by
similar objects". The reference repo stops at PageRank-family scores;
SimRank extends the link-analysis family with a pairwise similarity the
LLM-pipeline side uses for related-entity retrieval.

Determinism contract (mirrors the PageRank unrolled-CTE oracle):
iteration 1 is EXACT — ``s1(a,b) = C·|I(a)∩I(b)| / (dᵃ·dᵇ)``, an
integer count and one pinned ``(C·t)/(dᵃ·dᵇ)`` division. Later
iterations sum doubles inside ONE aggregate per pair (unordered, ulp
noise only) and apply the same pinned projection, so after the
contract's 1e-6 truncation both engines agree — the identical
argument (and test evidence) as ``_pagerank_fixed_oracle``.

Scale shape, stated honestly: ALL-PAIRS SimRank is Θ(V²) state by
definition — no partitioning trick removes that. This operator keeps
only the NONZERO pairs (sparse state, symmetric half + implicit unit
diagonal), expands through two edge equi-joins per iteration (never a
cartesian), and is intended for moderate vertex counts (entity
vocabularies, not raw documents); the established 100-TB path is the
Monte-Carlo estimator over reverse walks (Fogaras & Rácz, WWW 2005),
whose deterministic walk machinery lives in ``operators/randomwalk.py``.
Iterations rotate ``local_ckpt`` state (the leak rule in
``plans/checkpoint.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import free_local_ckpt, local_ckpt


def simrank(
    edges: DataFrame,
    iters: int = 3,
    c: float = 0.8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Nonzero off-diagonal SimRank scores ``(a, b, s)`` with ``a < b``
    after ``iters`` iterations from the unit-diagonal start."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    din = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("d"))
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )

    def _project(counts: DataFrame) -> DataFrame:
        # pinned association: (C · t) / (dᵃ·dᵇ) — integers exact, one division
        da = din.select(F.col("id").alias("a"), F.col("d").alias("_da"))
        db = din.select(F.col("id").alias("b"), F.col("d").alias("_db"))
        return (
            counts.join(da, "a")
            .join(db, "b")
            .select(
                "a",
                "b",
                (
                    (F.lit(float(c)) * F.col("t"))
                    / (F.col("_da") * F.col("_db")).cast("double")
                ).alias("s"),
            )
        )

    ea = e.select(F.col("src").alias("_i"), F.col("dst").alias("a"))
    eb = e.select(F.col("src").alias("_j"), F.col("dst").alias("b"))

    # iteration 1: common in-neighbors (the diag-only start, exact ints)
    c1 = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.src") == F.col("y.src"))
        .where(F.col("x.dst") < F.col("y.dst"))
        .groupBy(F.col("x.dst").alias("a"), F.col("y.dst").alias("b"))
        .agg(F.count("*").cast("double").alias("t"))
    )
    p, ck_ids = local_ckpt(_project(c1))
    for _ in range(iters - 1):
        sym = (
            p.select(F.col("a").alias("_i"), F.col("b").alias("_j"), "s")
            .union(p.select(F.col("b").alias("_i"), F.col("a").alias("_j"), "s"))
            .union(
                verts.select(
                    F.col("id").alias("_i"),
                    F.col("id").alias("_j"),
                    F.lit(1.0).alias("s"),
                )
            )
        )
        cexp = (
            sym.join(ea, "_i")
            .join(eb, "_j")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("s").alias("t"))
        )
        nxt, nxt_ids = local_ckpt(_project(cexp))
        free_local_ckpt(spark, ck_ids)
        p, ck_ids = nxt, nxt_ids
    # final state keeps its blocks (lineage is truncated — the blocks
    # are the only copy; see the checkpoint-leak rule)
    return p
