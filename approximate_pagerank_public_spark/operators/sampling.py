"""Deterministic sampling operators for training-data curation.

A 100-TB corpus pipeline needs reproducible, cluster-size-independent
sampling: train/val/test assignment that never moves a document between
splits when the corpus grows, and per-stratum subsampling whose output
is a pure function of (seed, ids) — not of partitioning, task order, or
an RNG stream. Everything here derives from md5 of ``seed:id`` (the
same derandomization used by the random-walk family,
``operators/randomwalk.py``), so the DuckDB oracles replay the exact
assignment and the driver's value-hash check is meaningful.

- :func:`hash_bucket` — 60-bit md5 draw → integer bucket in
  ``[0, denom)``. The primitive underneath both operators.
- :func:`dataset_split` — proportional split assignment. A document's
  bucket depends only on its id, so adding data never reassigns
  existing rows (the property per-partition ``randomSplit`` lacks).
- :func:`stratified_sample` — smallest-k-by-hash per stratum: a
  deterministic reservoir-sample equivalent (each stratum's k rows are
  a uniform sample over any id universe), one hash shuffle on the
  stratum column + a per-stratum top-k window, no global sort.

Scale shape: ``dataset_split`` is a pure map (no shuffle at all);
``stratified_sample`` shuffles by stratum and keeps k rows per stratum
— skewed strata cost one partition's sort of their own rows only, and
a rank-truncated window never materializes more than the partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_bucket(id_col: str, seed: str, denom: int = 1_000_000) -> F.Column:
    """``int(md5(f"{seed}:{id}")[:15], 16) % denom`` — 60 bits fit a
    signed i64 in Spark and DuckDB replays it verbatim
    (``CAST('0x' || substr(md5(...), 1, 15) AS BIGINT) % denom``)."""
    payload = F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long") % F.lit(
        int(denom)
    )


def dataset_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    seed: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named fraction.

    ``fractions`` maps split name → fraction; they must sum to 1 (±1e-9).
    Assignment thresholds are integer millionths over the md5 bucket, in
    the DICT ORDER GIVEN — stable, growth-invariant, partition-free.
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = hash_bucket(id_col, seed)
    expr = None
    acc = 0
    names = list(fractions.items())
    for name, frac in names[:-1]:
        acc += int(round(frac * 1_000_000))
        cond = bucket < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper bucket bound) pairs — exported so the SQL
    oracle builds its CASE from the identical integers."""
    out: list[tuple[str, int]] = []
    acc = 0
    for name, frac in list(fractions.items())[:-1]:
        acc += int(round(frac * 1_000_000))
        out.append((name, acc))
    out.append((list(fractions.keys())[-1], 1_000_000))
    return out


def quality_resample(
    df: DataFrame,
    weight_col: str = "quality",
    id_col: str = "doc_id",
    seed: str = "qres",
) -> DataFrame:
    """Deterministic Bernoulli thinning by a per-row weight in [0, 1]
    (the DCLM/FineWeb-style quality resample): keep a row iff its md5
    bucket (millionths) is below ``floor(weight * 10^6)``.

    The threshold is the weight's stable6 integer — the identical
    truncation the oracles use for float columns — so the keep/drop
    decision is a pure integer comparison both engines replay exactly,
    even though the weight itself is a float expression. A pure map:
    no shuffle, growth-invariant (adding documents never flips an
    existing row's decision), expected keep fraction = mean weight."""
    thr = F.floor(F.col(weight_col) * F.lit(1_000_000.0)).cast("long")
    return df.where(hash_bucket(id_col, seed) < thr)


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 10,
    seed: str = "strat",
) -> DataFrame:
    """Keep the k rows with the smallest ``(md5 draw, id)`` per stratum;
    adds ``sample_rank`` (1-based within the stratum).

    Equivalent in distribution to a uniform k-reservoir per stratum, but
    a pure function of (seed, ids): re-running on any cluster size, row
    order, or superset-partitioning yields the identical sample.
    """
    hv = hash_bucket(id_col, seed, denom=1 << 60)
    w = Window.partitionBy(strata_col).orderBy(hv.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= F.lit(int(k)))
    )


def mixture_resample(
    df: DataFrame,
    targets_bp: dict[str, int],
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Downsample to TARGET MIXTURE PROPORTIONS (the data-mixing step
    of a pretraining pipeline, DoReMi-style reweighting applied by
    deterministic thinning): ``targets_bp`` maps group → share in basis
    points (must sum to 10000); the output keeps, per group, exactly
    the md5-bucket prefix that realizes the largest total consistent
    with every target, ``T = min_g (n_g · 10000) div bp_g``.

    All arithmetic is integer (thresholds in millionths:
    ``thr_g = (bp_g · T · 1_000_000) div (10000 · n_g)``; keep iff
    ``md5_bucket < thr_g``), so membership is exact, growth-invariant,
    and replays verbatim in SQL. Groups absent from ``targets_bp`` are
    dropped (share 0).

    Scale shape: one map-side-combinable group count, a broadcast
    threshold join, then a pure map — the corpus is never shuffled.
    """
    if sum(targets_bp.values()) != 10_000:
        raise ValueError("targets_bp must sum to 10000")
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(g, int(bp)) for g, bp in sorted(targets_bp.items())],
        f"{group_col} string, bp int",
    )
    counts = df.groupBy(group_col).agg(F.count("*").alias("n"))
    per = counts.join(F.broadcast(tgt), group_col).select(
        group_col, "n", "bp", F.expr("(n * 10000) div bp").alias("q")
    )
    t_total = per.agg(F.min("q").alias("t"))
    thr = per.crossJoin(F.broadcast(t_total)).select(
        group_col,
        F.expr("(bp * t * 1000000) div (10000 * n)").alias("thr"),
    )
    return (
        df.join(F.broadcast(thr), group_col)
        .where(hash_bucket(id_col, seed) < F.col("thr"))
        .select(id_col, group_col)
    )
