"""Event-stream relational operators: sessionization and as-of join.

The reference engine's input is a static edge list; the engine's own
primary input is an event stream (``events`` → transcripts → edges,
``sources/transcripts.py``), and a production deployment of the same
pipeline needs the two classic stream-shaping operators on that table:

- :func:`sessionize` — gap-based session assignment (a new session
  starts when the idle gap from the previous event of the same user
  exceeds a threshold). The standard web/agent-analytics primitive;
  also the batch twin of the stateful-streaming operator family in
  ``streaming/edge_stream.py``.
- :func:`asof_join` — for every left row, the most recent right row at
  or before it (per key). Spark has no built-in AS OF join; the naive
  formulation is an inequality range join (O(n·m) expansion). This
  implements the union+window trick instead: tag both sides, sort once
  within each key partition, carry the last-seen right payload forward
  with ``last(..., ignorenulls=True)``.

Scale shape: both operators are ONE hash shuffle on the key column and
a within-partition sort — no range join, no cross product, no driver
state. Per-key row counts (events per user) are the only skew axis, the
same axis the rest of the engine already handles, and the window never
needs more than the current partition. This is the formulation
kdb/Flink/QuestDB use for as-of semantics at scale.

Determinism: every window order is a TOTAL order — ``(ts, side, id)``
— so outputs are reproducible across engines; the DuckDB oracles in
``__spark_entry__.py`` replay the identical window programs. Gap
arithmetic uses integer MICROSECONDS (``unix_micros`` / ``epoch_us``),
never float seconds, so session boundaries are hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 14400,
) -> DataFrame:
    """Assign gap-based sessions: input columns plus ``session_seq``
    (0-based per key, in time order).

    A new session starts at the first event of a key and whenever
    ``ts - prev_ts > gap_seconds``. Ordering ties are broken by
    ``id_col`` so the assignment is total-order deterministic.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    # timestampdiff is tz-free and accepts TIMESTAMP and TIMESTAMP_NTZ
    # alike (parquet event times are NTZ); only DIFFERENCES enter the
    # gap rule, so the session assignment never depends on a zone.
    with_prev = events.withColumn("_prev_ts", F.lag(F.col(ts_col)).over(w))
    gap_us = F.expr(f"timestampdiff(MICROSECOND, _prev_ts, {ts_col})")
    is_new = F.when(
        F.col("_prev_ts").isNull()
        | (gap_us > F.lit(int(gap_seconds) * 1_000_000)),
        F.lit(1),
    ).otherwise(F.lit(0))
    cum = Window.partitionBy(key_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return with_prev.withColumn(
        "session_seq", (F.sum(is_new).over(cum) - 1).cast("long")
    ).drop("_prev_ts")


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 14400,
) -> DataFrame:
    """Per-session aggregates: ``(key, session_seq, n_events,
    duration_us, first_event, last_event)`` — all integers, hash-exact.
    """
    s = sessionize(events, key_col, ts_col, id_col, gap_seconds)
    return (
        s.groupBy(F.col(key_col), F.col("session_seq"))
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("_min_ts"),
            F.max(ts_col).alias("_max_ts"),
            F.min(id_col).alias("first_event"),
            F.max(id_col).alias("last_event"),
        )
        .withColumn(
            "duration_us", F.expr("timestampdiff(MICROSECOND, _min_ts, _max_ts)")
        )
        .select(
            key_col, "session_seq", "n_events", "duration_us",
            "first_event", "last_event",
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    payload_cols: tuple[str, ...] = ("value",),
    strict: bool = False,
) -> DataFrame:
    """AS OF join: each ``left`` row gains ``asof_<c>`` for every payload
    column — taken from the latest ``right`` row of the same key with
    ``right.ts <= left.ts`` (``< left.ts`` when ``strict``), ties at
    equal ``ts`` resolved toward the highest right ``id_col``.

    Union + single within-key sort; no inequality join. Payloads pass
    through untouched (no float arithmetic), so results are bit-exact.
    """
    l_cols = left.columns
    lt = left.select(
        *l_cols,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}")
            for c in payload_cols
        ],
        F.lit(1).alias("_side"),
    )
    # right rows carry only key/ts/id + payloads
    rt = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(id_col),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    for c in l_cols:
        if c not in (key_col, ts_col, id_col):
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    rt = rt.select(*l_cols, *[f"_p_{c}" for c in payload_cols], F.lit(0).alias("_side"))

    u = lt.unionByName(rt)
    # Total order: ts, then right-before-left at equal ts (side 0 < 1;
    # strict mode flips so right at equal ts is NOT visible), then id.
    side_order = F.col("_side").asc() if not strict else F.col("_side").desc()
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), side_order, F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *l_cols,
        F.col("_side"),
        *[
            F.last(F.col(f"_p_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload_cols
        ],
    )
    return carried.where(F.col("_side") == 1).drop("_side")


def funnel(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each key, the greedy-earliest strict
    progression through ``steps`` — ``t1 = min ts of steps[0]``, then
    ``t_{k+1} = min ts of steps[k+1] with ts > t_k``.

    Output: ``(key, steps_completed, t0_offset_us, d01_us, d12_us, ...)``
    — every time value is an integer MICROSECOND *difference* (first
    step offset from the key's first event; then step-to-step gaps), so
    results are hash-exact and timezone-free (the same discipline as
    :func:`sessionize`; absolute epochs never leave the engine).

    Execution: ONE hash shuffle on ``key_col``. Step events are folded
    per key with ``F.aggregate`` over the (ts, id)-sorted struct array —
    a JVM-side codegen'd fold, no UDF, no per-step join or window pass
    (K chained conditional-min joins would pay K shuffles). Per-key
    memory is bounded by that key's step-event count — the same skew
    axis as :func:`sessionize`.
    """
    k = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    ev = F.when(
        F.col(type_col).isin(list(steps)),
        F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("id"),
                 F.col(type_col).alias("t")),
    )
    grouped = events.groupBy(F.col(key_col)).agg(
        F.array_sort(F.collect_list(ev)).alias("_evs"),
        F.min(ts_col).alias("_first_ts"),
    )
    acc0 = F.expr("CAST(array() AS array<timestamp>)")
    times = F.aggregate(
        F.col("_evs"),
        acc0,
        # F.get (0-based) is the null-safe accessor: out-of-range reads
        # yield NULL instead of an ANSI error (conjunct short-circuiting
        # is not a language guarantee), and the NULL-valued comparisons
        # make the WHEN condition fall through to `otherwise(acc)`
        lambda acc, x: F.when(
            (F.size(acc) < k)
            & (x["t"] == F.get(step_arr, F.size(acc)))
            & ((F.size(acc) == 0) | (x["ts"] > F.get(acc, F.size(acc) - 1))),
            F.concat(acc, F.array(x["ts"])),
        ).otherwise(acc),
    )
    out = grouped.withColumn("_times", times).select(
        key_col,
        F.size("_times").alias("steps_completed"),
        F.expr(
            "timestampdiff(MICROSECOND, _first_ts, get(_times, 0))"
        ).alias("t0_offset_us"),
        *[
            F.expr(
                f"timestampdiff(MICROSECOND, get(_times, {i - 1}), get(_times, {i}))"
            ).alias(f"d{i - 1}{i}_us")
            for i in range(1, k)
        ],
    )
    return out


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order transition counts (Markov bigrams over the event-type
    sequence): ``(prev_type, next_type, n)`` over consecutive events of
    the same key in ``(ts, id)`` total order.

    One key shuffle + within-partition sort (``lag`` window), then a
    map-side-combined count aggregate over ≤ |types|² groups — the
    transcript analogue of the edge-derivation window in
    ``operators/etl.py``, kept as its own operator because the
    transition matrix (not the edge list) is the analytics product.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    pairs = events.select(
        F.lag(F.col(type_col)).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    return pairs.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))


def props_numeric_stats(
    events: DataFrame,
    json_path: str = "$.k",
    props_col: str = "props",
    group_col: str = "event_type",
) -> DataFrame:
    """Semi-structured payload aggregation: extract one numeric field
    from the JSON ``props_col`` (``get_json_object`` — codegen'd Jackson
    path, no UDF) and aggregate per group: ``(group, n_events, n_with_k,
    sum_k, min_k, max_k)`` — all integers, hash-exact.

    The agent-transcript analogue: tool-call payloads arrive as JSON
    strings; scale cost is one map-side-combined aggregate over
    |groups| keys.
    """
    v = F.get_json_object(F.col(props_col), json_path).cast("long")
    return events.groupBy(F.col(group_col)).agg(
        F.count("*").alias("n_events"),
        F.count(v).alias("n_with_k"),
        F.sum(v).alias("sum_k"),
        F.min(v).alias("min_k"),
        F.max(v).alias("max_k"),
    )


def hourly_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    window_us: int = 3_600_000_000,
) -> DataFrame:
    """Tumbling-window rollup anchored at the stream's first event:
    ``(window_idx, event_type, n_events, value_cents)`` where
    ``window_idx = (ts - min(ts)) DIV window_us`` — the batch twin of a
    ``F.window``-based Structured Streaming aggregate, but keyed by an
    integer DIFFERENCE from the stream origin so the result is
    timezone-free and hash-exact (absolute epochs never appear).

    Money stays in integer cents (``round(value*100)`` is bit-exact on
    the 2-dp fixtures — see ``operators/relational.py``); the window
    index is exact BIGINT division of an exact microsecond difference.

    Scale shape: one scalar min (map-side combinable) broadcast to the
    edge pass, then ONE map-side-combined aggregation over
    |windows|·|types| keys. No windows-the-SQL-kind, no collects.
    """
    t0 = events.agg(F.min(ts_col).alias("_t0"))
    diff = F.expr(f"timestampdiff(MICROSECOND, _t0, {ts_col})")
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        events.crossJoin(F.broadcast(t0))
        .select(
            (diff - diff % F.lit(window_us)).cast("long").alias("_off"),
            F.col(type_col).alias("event_type"),
            cents.alias("_cents"),
        )
        .select(
            (F.col("_off") / F.lit(window_us)).cast("long").alias("window_idx"),
            "event_type",
            "_cents",
        )
        .groupBy("window_idx", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("_cents").alias("value_cents"),
        )
    )


def tool_error_adjacency(
    transcripts: DataFrame, error_tool: str = "tool_error"
) -> DataFrame:
    """Per-tool reliability readout over agent transcripts:
    ``(tool, n_calls, n_with_next, n_next_error, error_follow_rate)``
    — for every tool turn, whether the NEXT tool turn in the same
    conversation is the error tool; the rate is
    ``n_next_error / n_with_next`` (one IEEE division; conversations'
    final tool turns have no successor and are excluded from the
    denominator).

    Scale shape: one conv_id shuffle + lead window over the TOOL TURNS
    ONLY (the filter runs before the window), then a map-side-combined
    aggregate over ≤ |tools| groups.
    """
    from pyspark.sql.window import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    t = (
        transcripts.where(
            (F.col("role") == "tool") & F.col("tool").isNotNull()
        )
        .select("conv_id", "turn_idx", "tool")
        .withColumn("_next", F.lead("tool").over(w))
    )
    return t.groupBy("tool").agg(
        F.count("*").alias("n_calls"),
        F.sum(F.when(F.col("_next").isNotNull(), 1).otherwise(0)).alias(
            "n_with_next"
        ),
        F.sum(
            F.when(F.col("_next") == F.lit(error_tool), 1).otherwise(0)
        ).alias("n_next_error"),
        F.when(
            F.sum(F.when(F.col("_next").isNotNull(), 1).otherwise(0)) == 0,
            F.lit(0.0),
        )
        .otherwise(
            F.sum(
                F.when(F.col("_next") == F.lit(error_tool), 1).otherwise(0)
            ).cast("double")
            / F.sum(
                F.when(F.col("_next").isNotNull(), 1).otherwise(0)
            ).cast("double")
        )
        .alias("error_follow_rate"),
    )


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Classic cohort-retention table over the event stream:
    ``(cohort_bucket, age_buckets, users)`` — users bucketed by their
    FIRST-activity hour (relative to the stream origin, the tz-free
    integer-difference convention of :func:`hourly_rollup`), counted in
    every later hour they are active, keyed by hours-since-cohort.

    Scale shape: one distinct (user, hour) shuffle, one per-user min
    (map-side combinable), one user-key join, one final
    |cohorts|·|ages| aggregation — all integers, hash-exact.
    """
    t0 = events.agg(F.min(ts_col).alias("_t0"))
    uh = (
        events.crossJoin(F.broadcast(t0))
        .select(
            F.col(user_col).alias("user"),
            F.expr(
                f"timestampdiff(MICROSECOND, _t0, {ts_col}) div {int(bucket_us)}"
            ).alias("h"),
        )
        .distinct()
    )
    cohort = uh.groupBy("user").agg(F.min("h").alias("cohort_bucket"))
    return (
        uh.join(cohort, "user")
        .groupBy(
            "cohort_bucket",
            (F.col("h") - F.col("cohort_bucket")).alias("age_buckets"),
        )
        .agg(F.count("*").alias("users"))
    )


def turn_latency(transcripts: DataFrame) -> DataFrame:
    """Per-conversation inter-turn latency: ``(conv_id, n_turns,
    total_gap_us, max_gap_us, avg_gap_us)`` over consecutive turns in
    stable ``turn_idx`` order.

    Gaps are integer-microsecond DIFFERENCES (``timestampdiff`` — the
    same tz-free convention as :func:`sessionize`), so every aggregate
    is an exact BIGINT; ``avg_gap_us = total / (n_turns - 1)`` is one
    IEEE division (0.0 for single-turn conversations, which have no
    gaps). The turn-ordering invariant (``turn_idx`` consistent with
    ``ts``) makes every gap non-negative.

    Scale shape: one hash shuffle on ``conv_id`` + within-partition
    sort (the window never spans partitions), then a map-side-combined
    per-conversation aggregate. Per-conversation turn count is the only
    skew axis — same axis as sessionization.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gap = F.expr("timestampdiff(MICROSECOND, _prev_ts, ts)")
    with_gap = transcripts.select(
        "conv_id", "turn_idx", "ts"
    ).withColumn("_prev_ts", F.lag("ts").over(w))
    per = with_gap.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.coalesce(F.sum(gap), F.lit(0)).alias("total_gap_us"),
        F.coalesce(F.max(gap), F.lit(0)).alias("max_gap_us"),
    )
    return per.select(
        "conv_id",
        "n_turns",
        "total_gap_us",
        "max_gap_us",
        F.when(F.col("n_turns") <= 1, F.lit(0.0))
        .otherwise(
            F.col("total_gap_us").cast("double")
            / (F.col("n_turns") - 1).cast("double")
        )
        .alias("avg_gap_us"),
    )


def tool_latency(transcripts: DataFrame) -> DataFrame:
    """Per-tool response-time proxy over agent transcripts: for every
    tool turn, the integer-microsecond gap from the PREVIOUS turn in
    the same conversation (the time between the call being issued and
    the tool result landing), aggregated per tool as ``(tool, n_calls,
    total_gap_us, max_gap_us, avg_gap_us)``.

    Gaps use the same tz-free ``timestampdiff`` convention as
    :func:`sessionize`/:func:`turn_latency`; sums and maxes are exact
    BIGINTs, the mean is one IEEE division. Tool turns at ``turn_idx``
    0 have no predecessor and are excluded (no gap exists).

    Scale shape: one conv_id shuffle + lag window, then a map-side
    combined aggregate over ≤ |tools| groups.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gap = F.expr("timestampdiff(MICROSECOND, _prev_ts, ts)")
    g = (
        transcripts.select("conv_id", "turn_idx", "role", "tool", "ts")
        .withColumn("_prev_ts", F.lag("ts").over(w))
        .where(
            (F.col("role") == "tool")
            & F.col("tool").isNotNull()
            & F.col("_prev_ts").isNotNull()
        )
        .select("tool", gap.alias("gap"))
    )
    return g.groupBy("tool").agg(
        F.count("*").alias("n_calls"),
        F.sum("gap").alias("total_gap_us"),
        F.max("gap").alias("max_gap_us"),
        (F.sum("gap").cast("double") / F.count("*").cast("double")).alias(
            "avg_gap_us"
        ),
    )


def tool_latency_quantiles(
    transcripts: DataFrame, percents=(50, 95)
) -> DataFrame:
    """``(tool, p, n, rank, value)`` — exact per-tool latency
    percentiles (p50/p95 by default) over the same integer-µs gaps as
    :func:`tool_latency`, via the grouped histogram-cumsum selector
    (``functions/quantiles.py::exact_int_quantiles_by``): the per-tool
    window runs over that tool's DISTINCT gap values, never its rows —
    the ops-dashboard readout at any corpus size."""
    from pyspark.sql.window import Window as W

    from approximate_pagerank_public_spark.functions.quantiles import (
        exact_int_quantiles_by,
    )

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    gap = F.expr("timestampdiff(MICROSECOND, _prev_ts, ts)")
    g = (
        transcripts.select("conv_id", "turn_idx", "role", "tool", "ts")
        .withColumn("_prev_ts", F.lag("ts").over(w))
        .where(
            (F.col("role") == "tool")
            & F.col("tool").isNotNull()
            & F.col("_prev_ts").isNotNull()
        )
        .select("tool", gap.alias("gap"))
    )
    return exact_int_quantiles_by(g, "tool", "gap", percents)


def sliding_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_us: int = 3_600_000_000,
    slide_us: int = 900_000_000,
) -> DataFrame:
    """Hopping-window rollup (the overlapping-window sibling of
    :func:`hourly_rollup`, i.e. the batch twin of
    ``F.window(ts, "1 hour", "15 minutes")``): each event lands in
    ``window_us / slide_us`` windows; window ``w`` covers
    ``[w·slide, w·slide + window)`` microseconds after the stream's
    first event. Output ``(window_idx, event_type, n_events)``.

    Window indices are exact BIGINT arithmetic on integer-microsecond
    DIFFERENCES (tz-free, hash-exact). The per-event explode is bounded
    by the window/slide ratio (a constant), so the op stays one
    scalar-min broadcast + one bounded fan-out + one map-side-combined
    aggregation at any scale.
    """
    if window_us % slide_us != 0:
        raise ValueError("window_us must be a multiple of slide_us")
    k = window_us // slide_us
    t0 = events.agg(F.min(ts_col).alias("_t0"))
    # all-integer window math on BIGINT µs differences; an event in
    # slide-slot w_max belongs to the k windows [w_max-k+1, w_max]
    # clamped at 0 — phrased this way so no negative quantity is ever
    # divided (both engines' integer division truncates toward zero,
    # which would silently drop the earliest window for early events)
    diff_sql = f"timestampdiff(MICROSECOND, _t0, {ts_col})"
    w_max = F.expr(f"({diff_sql}) div {slide_us}")
    w_min = F.greatest(F.lit(0).cast("long"), w_max - F.lit(k - 1))
    return (
        events.crossJoin(F.broadcast(t0))
        .select(
            F.explode(F.sequence(w_min, w_max)).alias("window_idx"),
            F.col(type_col).alias("event_type"),
        )
        .groupBy("window_idx", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_gap_us: int = 1,
    max_gap_us: int = 3_600_000_000,
) -> DataFrame:
    """Time-bounded stream-stream join (attribution): every
    ``(left, right)`` pair of the same key with
    ``min_gap_us <= right.ts - left.ts <= max_gap_us`` — e.g. each
    click paired with every purchase by that user inside the next hour.
    Output ``(left_id, right_id, gap_us)``, gap as exact BIGINT
    microseconds (tz-free, hash-exact across engines).

    This is the batch twin of Structured Streaming's watermarked
    interval join (``streaming/join_stream.py::stream_interval_join``
    runs the identical predicate through ``readStream`` and is
    parity-tested against this). Plan shape: ONE equi-shuffle on the
    key; the band predicate rides the join as a post-condition, so
    there is no inequality-only (nested-loop) join anywhere. Fan-out is
    pairs-within-window per key — the same output the streaming side
    must retain in state, i.e. inherent to the semantics, not to the
    plan. At 100 TB the key shuffle partitions by user; a hot key's
    pair count is bounded by its events inside ``max_gap_us``, which a
    watermark bounds in the streaming twin.
    """
    lt = left.select(
        F.col(key_col), F.col(ts_col), F.col(id_col).alias("left_id")
    )
    rt = right.select(
        F.col(key_col),
        F.col(ts_col).alias("_r_ts"),
        F.col(id_col).alias("right_id"),
    )
    # integer-µs difference; timestampdiff works for both TIMESTAMP and
    # the parquet reader's TIMESTAMP_NTZ (unix_micros rejects NTZ)
    gap = F.expr(f"timestampdiff(MICROSECOND, {ts_col}, _r_ts)")
    return (
        lt.join(rt, key_col)
        .where(gap.between(F.lit(min_gap_us), F.lit(max_gap_us)))
        .select(
            "left_id",
            "right_id",
            gap.alias("gap_us"),
        )
    )


def rate_anomaly(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    window_us: int = 3_600_000_000,
) -> DataFrame:
    """Per-(event_type, window) activity z-score — the classic rate
    anomaly detector over a metric stream: ``z = (c - mean) / std``
    where the mean/std are taken over the type's PRESENT windows
    (windows with zero events of that type contribute nothing — the
    detector scores observed load against observed history).

    Determinism: everything up to the final division is exact integer
    arithmetic — ``z = (n·c - S1) / sqrt(n·S2 - S1²)`` with S1 = Σc,
    S2 = Σc² per type — and IEEE-754 sqrt is correctly rounded on both
    engines (the same cross-engine contract as
    ``weighted_negative_samples``), so one division is the only
    rounding site. ``z = 0`` when the variance is zero. Exactness
    holds while the integer terms stay within 2^53 (hourly counts per
    type — far beyond any realistic window load).

    Scale shape: one map-side-combined count per (type, window), one
    |types|-row stats aggregate broadcast back — no window-the-SQL-kind
    over the event stream, no skew (the join key is event_type against
    a broadcast side).
    """
    counts = hourly_rollup(events, ts_col, type_col, value_col, window_us).select(
        "window_idx", "event_type", "n_events"
    )
    stats = counts.groupBy("event_type").agg(
        F.count("*").alias("_nw"),
        F.sum("n_events").alias("_s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("_s2"),
    )
    j = counts.join(F.broadcast(stats), "event_type")
    num = F.col("_nw") * F.col("n_events") - F.col("_s1")
    rad = F.col("_nw") * F.col("_s2") - F.col("_s1") * F.col("_s1")
    z = F.when(rad == 0, F.lit(0.0)).otherwise(
        num.cast("double") / F.sqrt(rad.cast("double"))
    )
    return j.select("event_type", "window_idx", "n_events", z.alias("z"))


def role_trigrams(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
) -> DataFrame:
    """Second-order conversation-flow counts: role-sequence trigrams
    ``(r1, r2, r3, n)`` over each conversation's stable ``turn_idx``
    order — the step beyond :func:`event_transitions`' bigram matrix
    (who speaks after whom *given* the previous two turns; the flow
    signature that separates tool-looping agents from ping-pong chats).

    One conversation-key shuffle + two ``lag`` windows sharing the same
    sort, then a map-side-combined count over ≤ |roles|³ groups. The
    window never spans conversations, so no global ordering exists
    anywhere — the 100-TB shape is one shuffle of the (conv_id, role)
    projection.
    """
    w = Window.partitionBy(conv_col).orderBy(F.col(order_col).asc())
    tri = transcripts.select(
        F.lag(F.col(role_col), 2).over(w).alias("r1"),
        F.lag(F.col(role_col), 1).over(w).alias("r2"),
        F.col(role_col).alias("r3"),
    ).where(F.col("r1").isNotNull())
    return tri.groupBy("r1", "r2", "r3").agg(
        F.count("*").cast("long").alias("n")
    )
