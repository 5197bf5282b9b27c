"""Jones–Plassmann greedy graph coloring (deterministic, oracle-replayable).

The sibling of Luby MIS (``operators/mis.py``): every vertex gets ONE
static md5-string priority (id-appended ⇒ unique, no tie rule); each
round the priority-local-maxima of the *uncolored* subgraph color
themselves with the smallest color absent from their already-colored
neighbors, then leave the active set. Unlike Luby MIS, winners'
neighbors stay active — rounds equal the longest decreasing-priority
path, O(log n / log log n) expected for random priorities (Jones &
Plassmann 1993).

Everything is joins / min / anti-join on integers and md5 strings that
compare identically in both engines, so the full coloring is hash-exact
against an unrolled-CTE DuckDB replay. The min-free-color step walks
the SORTED DISTINCT neighbor-color array with a fold
(``aggregate(arr, 0, (acc, c) -> IF(c = acc, acc + 1, acc))``) — arrays
are bounded by the number of DISTINCT neighbor colors (≤ chromatic
bound), never by hub degree.

Scale shape per round: active-subgraph edge selection (two semi-joins),
one map-side-combined min per vertex, one bounded collect_set, state
rotated through ``plans/checkpoint.py::local_ckpt``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.plans.checkpoint import (
    free_local_ckpt,
    local_ckpt,
)
from approximate_pagerank_public_spark.plans.graph import Graph

_NO_NEIGHBOR = "~"  # sorts after every md5 hex digit

# Below this edge count the whole coloring runs as one driver-side
# kernel (one Arrow collect + pure-Python rounds): the distributed loop
# pays ~1 s of job-launch latency per round and JP needs
# O(longest decreasing-priority path) rounds, so small graphs are
# dominated by scheduling, exactly the regime the broadcast fast paths
# of SCC/SSSP exist for. Above the gate the distributed loop runs —
# per-round cost amortizes over real per-round work at scale. Both
# paths are bit-identical (parity-tested).
COLORING_DRIVER_MAX_EDGES = 2_000_000


def _prio(seed: str) -> F.Column:
    """Static unique priority: md5('<seed>:<id>') || zero-padded id."""
    return F.concat(
        F.md5(F.concat_ws(":", F.lit(seed), F.col("id"))),
        F.lpad(F.col("id").cast("string"), 12, "0"),
    )


def coloring_python(src, dst, n: int, seed: str = "col") -> tuple[dict, int]:
    """Pure-Python JP replay (identical md5 chain) — the driver-side
    fast-path kernel AND the golden the tests/oracle replay against."""
    import hashlib

    nbrs: dict[int, set[int]] = {v: set() for v in range(n)}
    for a, b in zip(src, dst):
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    pri = {
        v: hashlib.md5(f"{seed}:{v}".encode()).hexdigest() + str(v).zfill(12)
        for v in range(n)
    }
    active = set(range(n))
    colors: dict[int, int] = {}
    rounds = 0
    while active:
        rounds += 1
        win = {
            v
            for v in active
            if all(pri[v] < pri[u] for u in nbrs[v] if u in active)
        }
        for v in win:
            used = {colors[u] for u in nbrs[v] if u in colors}
            c = 0
            while c in used:
                c += 1
            colors[v] = c
        active -= win
    return colors, rounds


def greedy_coloring(
    graph: Graph, seed: str = "col", max_rounds: int = 500, mode: str = "auto"
) -> tuple[DataFrame, int]:
    """``((id, color), rounds)`` — a proper coloring of the symmetrized
    simple graph; colors are dense small ints starting at 0.

    ``mode``: ``"driver"`` (one collect + Python kernel, small graphs),
    ``"distributed"`` (per-round joins, the scale path), or ``"auto"``
    (driver below :data:`COLORING_DRIVER_MAX_EDGES`)."""
    spark = graph.spark
    if mode == "auto":
        mode = (
            "driver"
            if graph.num_edges <= COLORING_DRIVER_MAX_EDGES
            else "distributed"
        )
    if mode == "driver":
        src, dst, _w = graph.edges_numpy()
        colors, rounds = coloring_python(
            src.tolist(), dst.tolist(), graph.num_vertices, seed
        )
        df = spark.createDataFrame(
            [(int(v), int(c)) for v, c in sorted(colors.items())],
            "id long, color int",
        )
        return df, rounds
    p = graph.num_partitions
    sym = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .unionAll(
            graph.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            ).where(F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    sym, sym_ids = local_ckpt(sym.repartition(p, "src"))

    pri_all = graph.vertices.select("id", _prio(seed).alias("pr"))
    active, act_ids = local_ckpt(pri_all.repartition(p, "id"))
    colored: DataFrame | None = None
    col_ids: set[int] = set()
    rounds = 0
    while True:
        if active.limit(1).count() == 0:
            break
        rounds += 1
        if rounds > max_rounds:  # pragma: no cover
            raise RuntimeError(f"JP coloring did not finish in {max_rounds} rounds")
        act_e = (
            sym.join(active.select(F.col("id").alias("src")), "src")
            .join(
                active.select(F.col("id").alias("dst"), F.col("pr").alias("np")),
                "dst",
            )
            .select("src", "np")
        )
        nbr_min = act_e.groupBy("src").agg(F.min("np").alias("npr")).select(
            F.col("src").alias("id"), "npr"
        )
        winners = (
            active.join(nbr_min, "id", "left")
            .where(F.col("pr") < F.coalesce("npr", F.lit(_NO_NEIGHBOR)))
            .select("id")
        )
        if colored is None:
            forb = winners.select("id", F.array().cast("array<int>").alias("arr"))
        else:
            fpairs = (
                sym.join(winners.select(F.col("id").alias("src")), "src")
                .join(
                    colored.select(F.col("id").alias("dst"), "color"), "dst"
                )
                .select(F.col("src").alias("id"), "color")
            )
            forb = winners.join(
                fpairs.groupBy("id").agg(
                    F.array_sort(F.collect_set("color")).alias("arr")
                ),
                "id",
                "left",
            ).select(
                "id",
                F.coalesce("arr", F.array().cast("array<int>")).alias("arr"),
            )
        newly = forb.select(
            "id",
            F.expr(
                "aggregate(arr, 0, (acc, c) -> IF(c = acc, acc + 1, acc))"
            ).alias("color"),
        )
        nxt_colored = newly if colored is None else colored.unionAll(newly)
        nxt_colored, new_col_ids = local_ckpt(nxt_colored.repartition(p, "id"))
        if col_ids:
            free_local_ckpt(spark, col_ids)
        colored, col_ids = nxt_colored, new_col_ids

        nxt_active = active.join(winners, "id", "left_anti")
        nxt_active, new_act_ids = local_ckpt(nxt_active.repartition(p, "id"))
        free_local_ckpt(spark, act_ids)
        active, act_ids = nxt_active, new_act_ids

    free_local_ckpt(spark, sym_ids)
    free_local_ckpt(spark, act_ids)
    assert colored is not None
    return colored.select("id", F.col("color").cast("int").alias("color")), rounds
