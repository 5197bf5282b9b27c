"""BFS-family algorithms: level-synchronous BFS, multi-source BFS,
filtered BFS, closeness centrality, eccentricity.

Reference semantics (PGX Green-Marl CPU baselines):

- ``bfs.gm:1-14`` — level-synchronous BFS, ``dist=+INF`` init, each
  frontier level stamps ``dist = level``.
- ``bfs2.gm:1-16`` — sequential multi-source BFS.
- ``fbfs.gm:1-19`` — BFS with a vertex predicate hook.
- ``cc.gm:1-28`` — **closeness centrality**: per source,
  ``1 / Σ(levels)``; 0 for sources that do not reach the whole graph
  (disconnected detection).
- ``eccentricity.gm:1-30`` — per source max BFS level; graph diameter =
  max, radius = min.

Spark strategy: iterative frontier joins. The frontier is a DataFrame
``(id)``; each level expands via an equi-join with the edge table and an
anti-join against visited — both shuffle on vertex id and reuse the
graph's dst-hash partitioning. Multi-source runs carry a ``source``
column so S BFS traversals advance in one join per level (batched, like
the multi-PPR block).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Iterator

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.plans.checkpoint import (
    free_local_ckpt,
    local_ckpt,
)
from approximate_pagerank_public_spark.plans.graph import Graph


def bfs(
    graph: Graph,
    source: int,
    max_levels: int = 10_000,
    vertex_filter: Column | None = None,
) -> DataFrame:
    """``(id, dist)`` for vertices reachable from ``source``.

    ``vertex_filter`` (a boolean Column over ``id``) restricts which
    vertices may be visited — a *traversal*-blocking predicate (the
    reference ``fbfs.gm`` predicate gates only the property WRITE, not
    the traversal — that exact semantics is :func:`filtered_bfs`).
    Filterless runs take the frontier-sparse block kernel when CSR
    blocks exist.
    """
    if vertex_filter is None and graph.blocks is not None:
        return multi_source_bfs_block(graph, [source], max_levels).select("id", "dist")
    res = multi_source_bfs(graph, [source], max_levels, vertex_filter)
    return res.select("id", "dist")


def filtered_bfs(
    graph: Graph, root: int, skip_first: int = 9, max_levels: int = 10_000
) -> DataFrame:
    """Reference ``fbfs`` (``fbfs.gm:1-19``): BFS from ``root`` with a
    global visit counter ``cnt``; a visited vertex gets ``prop =
    2·cnt+1`` and ``dist = level`` only once ``cnt >= skip_first`` (the
    gm's ``(cnt+1)/10 != 0`` integer-division predicate ≡ skip the
    first 9 visits); earlier visits keep ``prop = 0`` and ``dist``
    unwritten. The root's ``dist = 0`` is written unconditionally
    (``fbfs.gm:9``). PGX leaves within-level visit order
    implementation-defined; here it is pinned to ascending vertex id
    within ascending level — deterministic, hence oracle-checkable.

    Returns ALL vertices: ``(id, dist, prop)`` with ``dist`` null for
    +INF. The counter ranks are assigned with the same scalable
    range-partition + per-partition row_number + driver-offset pattern
    as ``etl.densify_vertices`` — no global single-partition window.
    """
    from pyspark.sql.window import Window

    dists = bfs(graph, root, max_levels)  # (id, dist), reached only
    spark = graph.spark
    p = graph.num_partitions
    ranged = (
        dists.repartitionByRange(p, "dist", "id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {r["_pid"]: r["count"] for r in ranged.groupBy("_pid").count().collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(int(pid), int(off)) for pid, off in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy("dist", "id")
    cnted = ranged.join(F.broadcast(off_df), "_pid").select(
        "id",
        F.col("dist").cast("long").alias("dist"),
        (F.row_number().over(w) - 1 + F.col("_off")).alias("cnt"),
    )
    write = F.col("cnt") >= skip_first
    return graph.vertices.join(cnted, "id", "left").select(
        "id",
        F.when(write, F.col("dist"))
        .when(F.col("id") == root, F.lit(0))
        .cast("long")
        .alias("dist"),
        F.coalesce(F.when(write, 2 * F.col("cnt") + 1), F.lit(0))
        .cast("long")
        .alias("prop"),
    )


def multi_source_bfs(
    graph: Graph,
    sources: list[int],
    max_levels: int = 10_000,
    vertex_filter: Column | None = None,
) -> DataFrame:
    """``(source, id, dist)`` — S traversals batched per level."""
    spark = graph.spark
    p = graph.num_partitions
    import pandas as pd

    seed, seed_ids = local_ckpt(
        spark.createDataFrame(pd.DataFrame({"source": sources, "id": sources}))
        .withColumn("dist", F.lit(0))
        .repartition(p, "id")
    )
    # visited = lazy union of the per-level checkpointed frontiers:
    # no O(V) re-write of the whole visited set every level, and the
    # per-level emptiness check is a take(1) on the already-materialized
    # frontier instead of a separate blocking count() job.
    visited = seed
    frontier = seed
    # (df, storage ids) of the checkpoints backing the current `visited`;
    # superseded ones are FREED at each collapse (free_local_ckpt —
    # DataFrame.unpersist is a no-op for localCheckpoint blocks) so a
    # deep traversal never accumulates stale O(V) block sets
    pending = [(seed, seed_ids)]
    level = 0
    while level < max_levels:
        level += 1
        nxt = (
            frontier.join(
                graph.edges.select(F.col("src").alias("id"), "dst"), "id"
            )
            .select("source", F.col("dst").alias("id"))
            .distinct()
        )
        if vertex_filter is not None:
            nxt = nxt.where(vertex_filter)
        nxt, nxt_ids = local_ckpt(
            nxt.join(visited.select("source", "id"), ["source", "id"], "left_anti")
            .withColumn("dist", F.lit(level))
            .repartition(p, "id")
        )  # eager: the level's ONE materializing job
        if not nxt.take(1):
            free_local_ckpt(spark, nxt_ids)
            break
        visited = visited.unionAll(nxt)
        pending.append((nxt, nxt_ids))
        # collapse the lazy union every 8 levels: otherwise the plan
        # grows one leaf per level and Catalyst re-analysis is O(L^2)
        # over a 100+-diameter traversal; the amortized O(V/8) rewrite
        # per level is the cheaper side of that trade
        if level % 8 == 0:
            collapsed, coll_ids = local_ckpt(visited.repartition(p, "id"))
            # eager checkpoint above holds all rows, so the pre-collapse
            # leaves (except the live frontier, still joined next level)
            # and the previous collapsed snapshot are safe to release
            for df, ids in pending:
                if df is not nxt:
                    free_local_ckpt(spark, ids)
            visited = collapsed
            pending = [(collapsed, coll_ids), (nxt, nxt_ids)]
        frontier = nxt
    return visited


def bfs_stats(graph: Graph, sources: list[int]) -> DataFrame:
    """``(source, ecc, closeness)`` from ONE multi-source BFS.

    With CSR blocks the per-source aggregates (``cc.gm``/
    ``eccentricity.gm`` semantics) reduce directly over the (N, S)
    distance block on the driver — S scalars out, never a |reached|×S
    row set — so the 50-source PGX protocol workload costs exactly the
    frontier-sparse level loop. The distributed twin aggregates the
    ``(source, id, dist)`` DataFrame instead (identical values)."""
    if graph.blocks is not None:
        import pandas as pd

        dist, inf = _block_bfs_distances(graph, sources)
        dd = np.where(dist < inf - 1000, dist.astype(np.int64), 0)
        sums = dd.sum(axis=0)
        pdf = pd.DataFrame(
            {
                "source": np.asarray(sources, dtype=np.int64),
                "ecc": dd.max(axis=0),
                "closeness": np.where(sums > 0, 1.0 / np.maximum(sums, 1), 0.0),
            }
        )
        return graph.spark.createDataFrame(
            pdf, "source long, ecc long, closeness double"
        )
    dists = multi_source_bfs(graph, sources)
    return dists.groupBy("source").agg(
        F.max("dist").cast("long").alias("ecc"),
        F.when(F.sum("dist") > 0, 1.0 / F.sum("dist"))
        .otherwise(0.0)
        .alias("closeness"),
    )


def closeness_centrality(graph: Graph, sources: list[int]) -> DataFrame:
    """``(source, closeness)``: ``1/Σ dist`` over reached vertices; 0 when
    the source reaches nothing (matches ``cc.gm`` disconnected handling)."""
    return bfs_stats(graph, sources).select("source", "closeness")


def eccentricity(graph: Graph, sources: list[int]) -> DataFrame:
    """``(source, ecc)`` = max BFS level per source."""
    return bfs_stats(graph, sources).select("source", "ecc")


def harmonic_centrality(graph: Graph, sources: list[int]) -> DataFrame:
    """``(source, harmonic)``: ``Σ 1/d(source, u)`` over reached
    ``u ≠ source`` (Marchiori–Latora; the disconnected-robust variant of
    closeness — unreachable vertices contribute 0 instead of poisoning
    the sum, so no reachability special-case is needed).

    Cross-engine bit parity: the float sum is folded over the integer
    distance HISTOGRAM in ascending-d order — ``h = Σ_d count_d / d``
    with an explicit left fold — the same pinned-association discipline
    as the engine's dot products. Per source the histogram has ≤
    eccentricity entries, so the fold state is trivially small at any
    graph size; the distance pass itself is the shared frontier-sparse
    multi-source BFS (one pass for ALL sources).
    """
    if graph.blocks is not None:
        import pandas as pd

        dist, inf = _block_bfs_distances(graph, sources)
        rows = []
        for j, s in enumerate(sources):
            col = dist[:, j].astype(np.int64)
            reached = (col > 0) & (col < int(inf) - 1000)
            ds, cnts = np.unique(col[reached], return_counts=True)
            h = np.float64(0.0)
            for d, c in zip(ds, cnts):  # ascending d — pinned fold order
                h = h + np.float64(int(c)) / np.float64(int(d))
            rows.append((int(s), float(h)))
        pdf = pd.DataFrame(rows, columns=["source", "harmonic"])
        return graph.spark.createDataFrame(pdf, "source long, harmonic double")
    dists = multi_source_bfs(graph, sources)
    hist = (
        dists.where(F.col("dist") > 0)
        .groupBy("source", "dist")
        .agg(F.count("*").alias("cnt"))
    )
    agg = hist.groupBy("source").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("dist").alias("d"), "cnt"))),
            F.lit(0.0),
            lambda acc, x: acc + x["cnt"].cast("double") / x["d"].cast("double"),
        ).alias("harmonic")
    )
    srcs = graph.spark.createDataFrame(
        [(int(s),) for s in sources], "source long"
    )
    return srcs.join(agg, "source", "left").select(
        "source", F.coalesce("harmonic", F.lit(0.0)).alias("harmonic")
    )


def approx_diameter(graph: Graph, start: int = 0) -> DataFrame:
    """Double-sweep diameter lower bound (Magnien–Latapy–Habib): BFS
    from ``start``, hop to the farthest reached vertex (ties → smallest
    id, so the pick is deterministic and oracle-replayable), BFS again;
    the second eccentricity lower-bounds the directed diameter. One row
    ``(start, peak, diameter_lb)`` — two frontier-sparse BFS runs, no
    new machinery."""
    far = (
        bfs(graph, start)
        .orderBy(F.col("dist").desc(), F.col("id").asc())
        .first()  # top-1 reduces executor-side; |reached| never collects
    )
    peak = int(far["id"])
    ecc2 = bfs_stats(graph, [peak]).first()["ecc"]
    import pandas as pd

    pdf = pd.DataFrame(
        {"start": [start], "peak": [peak], "diameter_lb": [int(ecc2)]}
    )
    return graph.spark.createDataFrame(
        pdf, "start long, peak long, diameter_lb long"
    )




def widest_path(graph: Graph, source: int, max_rounds: int = 10_000) -> DataFrame:
    """``(id, cap)`` — bottleneck (widest-path) capacity from ``source``
    over the max-min semiring: ``cap(v) = max over paths of the min
    edge weight along the path``. On the transcript graph (weights =
    1/outdeg transition probabilities ≤ 1) this is the best bottleneck
    transition probability; the source seeds at 1.0, so non-source caps
    are always genuine edge-weight minima.

    Monotone frontier relaxation: per round, candidates
    ``least(cap[src], w)`` from the improved frontier, ONE
    map-side-combinable groupBy-max on dst, then an improvement join
    against the current state. Cycles cannot improve a max-min value
    and every cap is drawn from the finite set of edge weights, so the
    fixpoint is unique and rounds ≤ graph depth × distinct weights in
    the worst case (small in practice). No floats are ever accumulated
    — ``least``/``greatest`` only select, so the caps replay bit-exactly
    in the DuckDB recursive-CTE oracle. Lineage truncated per round via
    ``local_ckpt`` (the multi_source_bfs discipline)."""
    from approximate_pagerank_public_spark.plans.checkpoint import (
        free_local_ckpt,
        local_ckpt,
    )

    spark = graph.spark
    p = graph.num_partitions
    import pandas as pd

    caps, caps_ids = local_ckpt(
        spark.createDataFrame(
            pd.DataFrame({"id": [int(source)], "cap": [1.0]})
        ).repartition(p, "id")
    )
    frontier = caps
    front_ids: set = set()  # the seed's blocks belong to caps_ids
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        cand = (
            frontier.join(
                graph.edges.select(
                    F.col("src").alias("id"), "dst", "weight"
                ),
                "id",
            )
            .select(
                F.col("dst").alias("id"),
                F.least(F.col("cap"), F.col("weight")).alias("newcap"),
            )
            .groupBy("id")
            .agg(F.max("newcap").alias("newcap"))
        )
        improved, imp_ids = local_ckpt(
            cand.join(caps, "id", "left")
            .where(F.col("cap").isNull() | (F.col("newcap") > F.col("cap")))
            .select("id", F.col("newcap").alias("cap"))
            .repartition(p, "id")
        )
        if not improved.take(1):
            free_local_ckpt(spark, imp_ids)
            free_local_ckpt(spark, front_ids)
            break
        merged, merged_ids = local_ckpt(
            caps.join(improved.select("id", F.col("cap").alias("icap")), "id", "full")
            .select(
                "id",
                F.greatest(
                    F.coalesce(F.col("cap"), F.lit(float("-inf"))),
                    F.coalesce(F.col("icap"), F.lit(float("-inf"))),
                ).alias("cap"),
            )
            .repartition(p, "id")
        )
        merged.count()
        free_local_ckpt(spark, caps_ids)
        free_local_ckpt(spark, front_ids)
        caps, caps_ids = merged, merged_ids
        frontier, front_ids = improved, imp_ids
    return caps


def exact_diameter(
    graph: Graph, batch: int = 64, max_ecc_evals: int | None = None
) -> DataFrame:
    """EXACT diameter of the undirected component containing the
    max-degree vertex, by iFUB (Crescenzi-Grossi-Habib-Lanzi-Marino
    2013): BFS from a high-degree root, then examine fringe vertices by
    DESCENDING root-distance — every vertex at level i has all its
    > 2(i-1)-long pairs covered once its eccentricity is known, so the
    loop stops as soon as ``lb >= 2i`` with levels > i done (any pair
    longer than 2i needs an endpoint deeper than i, and those are all
    examined). On real (small-world)
    graphs that is a handful of levels and a few dozen eccentricity
    evaluations instead of |V| — and each level's evaluations are
    batched through the shared frontier-sparse multi-source BFS
    (``bfs_stats``), so a level costs ONE (N, S)-block traversal, not S
    sequential sweeps.

    Root pick is deterministic and oracle-replayable (max symmetrized
    degree, ties → smallest id); the RESULT is pick-independent (iFUB
    is exact for any root), so the DuckDB oracle simply computes the
    true all-pairs diameter of the root's component. Returns one row
    ``(start, diameter)``.

    Scale shape: the per-level candidate lists collected to the driver
    are the BFS-tree fringes — the deepest levels of a small-world /
    power-law graph hold a vanishing fraction of |V| (the algorithm's
    published termination behavior), and each is consumed in
    ``batch``-sized multi-source sweeps; nothing else leaves the
    cluster. On a UNIFORM random graph distances concentrate, the
    bound never closes early, and iFUB degrades toward all-sources
    BFS — iFUB's documented worst case (measured: the |E|=2·10⁷ G(n,m)
    probe was aborted at 10 min while the skewed sf0.1 transcript graph
    finishes in ~6 s). ``max_ecc_evals`` makes that failure mode LOUD:
    the run raises instead of silently sweeping Θ(|V|) sources.
    """
    gu = graph.undirected()
    root_row = (
        gu.edges.groupBy("src")
        .agg(F.count("*").alias("dg"))
        .orderBy(F.col("dg").desc(), F.col("src").asc())
        .first()
    )
    start = int(root_row["src"])
    dists = bfs(gu, start).select("id", "dist").persist()
    ecc_start = int(dists.agg(F.max("dist")).first()[0])
    lb = ecc_start
    i = ecc_start
    evals = 0
    while i > 0 and lb < 2 * i:
        vs = [
            int(r["id"])
            for r in dists.where(F.col("dist") == i).select("id").collect()
        ]
        evals += len(vs)
        if max_ecc_evals is not None and evals > max_ecc_evals:
            dists.unpersist()
            raise RuntimeError(
                f"exact_diameter: fringe sweep needs > {max_ecc_evals} "
                f"eccentricity evaluations (lb={lb}, level={i}, "
                f"|level|={len(vs)}) — iFUB is degenerating on this graph "
                "(uniform-degree inputs); use approx_diameter or raise "
                "max_ecc_evals"
            )
        for k in range(0, len(vs), batch):
            chunk = vs[k : k + batch]
            got = eccentricity(gu, chunk).agg(F.max("ecc")).first()[0]
            lb = max(lb, int(got))
        i -= 1
    dists.unpersist()
    import pandas as pd

    pdf = pd.DataFrame({"start": [start], "diameter": [int(lb)]})
    return graph.spark.createDataFrame(pdf, "start long, diameter long")


def multi_source_bfs_block(
    graph: Graph, sources: list[int], max_levels: int = 10_000
) -> DataFrame:
    """Frontier-sparse block-kernel multi-source BFS: the S distance
    vectors advance as one (N, S) int16 block through min-plus
    relaxations on the PageRank CSR blocks — ``dist' = min(dist,
    min_in(dist) + 1)`` (level-synchronous, reference ``bfs.gm:1-14``
    semantics, S sources amortizing each edge pass like the FPGA's
    8-query batching).

    Unlike a fixed full-edge gather per level (the r1 scale-killer —
    VERDICT r1), each level's single shuffle-free Spark job touches only
    edges whose **src improved last level**: workers mask their blocks'
    edges against a shared frontier bitmap, relax just those, and ship
    back only the rows that actually improved — so pre-peak and
    post-peak levels cost O(frontier edges), the whole traversal ~one
    full edge pass total instead of diameter-many, and the driver merge
    is a compressed scatter instead of an O(N·S) array per level.

    Right when vertex state fits the driver; the distributed twin is
    :func:`multi_source_bfs`. Returns ``(source, id, dist)`` over
    reached vertices only.
    """
    blocks = graph.blocks
    if blocks is None:
        return multi_source_bfs(graph, sources, max_levels)
    s = len(sources)
    src_arr = np.asarray(sources, dtype=np.int64)
    dist, inf = _block_bfs_distances(graph, sources, max_levels)
    # zero-pandas conversion: flat reached index → shm-backed columns (the
    # naive nonzero + pd.DataFrame path cost more than the BFS itself, and
    # a driver-local createDataFrame costs ~3 s/10⁶ rows through Py4J —
    # more than the whole warm traversal)
    flat = np.flatnonzero(dist.ravel() < inf - 1000)
    vid = flat // s
    sidx = flat - vid * s
    return _df_from_shm_columns(
        graph.spark,
        blocks,
        {
            "source": src_arr[sidx],
            "id": vid.astype(np.int64),
            "dist": dist.ravel()[flat].astype(np.int64),
        },
        "source long, id long, dist long",
    )


def _df_from_shm_columns(
    spark, blocks, cols: dict[str, np.ndarray], schema: str
) -> DataFrame:
    """Driver-resident NumPy columns → distributed DataFrame through the
    shared-memory block dir: columns are written once as .npy, tasks
    mmap disjoint row ranges (``mapInArrow``) — no Py4J upload of the
    payload, and downstream ops read it in parallel. Files live in a
    ``res_*`` subdir of the BlockStore dir, reclaimed by
    ``Graph.unpersist`` (re-reads must stay possible while the
    DataFrame's lineage is alive)."""
    import pyarrow as pa

    d = os.path.join(blocks.dir, f"res_{uuid.uuid4().hex}")
    os.makedirs(d)
    names = list(cols)
    n = len(cols[names[0]])
    for name, arr in cols.items():
        np.save(f"{d}/{name}.npy", np.ascontiguousarray(arr))
    p = max(1, min(spark.sparkContext.defaultParallelism, max(1, n // 65_536)))

    def gen(batches):
        for b in batches:
            for i in b.column("id").to_pylist():
                lo, hi = i * n // p, (i + 1) * n // p
                if hi > lo:
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(
                                np.asarray(
                                    np.load(f"{d}/{nm}.npy", mmap_mode="r")[lo:hi]
                                )
                            )
                            for nm in names
                        ],
                        names=names,
                    )

    return spark.range(0, p, 1, p).mapInArrow(gen, schema)


def _block_bfs_distances(
    graph: Graph, sources: list[int], max_levels: int = 10_000
) -> tuple[np.ndarray, int]:
    """The frontier-sparse level loop → ``((N, S) distance block, inf
    sentinel)``; see :func:`multi_source_bfs_block` for the design."""
    n = graph.num_vertices
    s = len(sources)
    # narrow dtype = 4-8x less state traffic per superstep (the block is
    # (N, S) and every edge reads an S-wide row); distances are bounded
    # by the diameter, so int16 suffices below 15k levels
    if max_levels < 15_000:
        dtype, inf = np.int16, np.int16(16_000)
    else:
        dtype, inf = np.int32, np.int32(np.iinfo(np.int32).max // 4)
    dist = np.full((n, s), inf, dtype=dtype)
    src_arr = np.asarray(sources, dtype=np.int64)
    dist[src_arr, np.arange(s)] = 0
    changed = np.zeros(n, dtype=bool)
    changed[src_arr] = True
    dist, _rounds, converged = frontier_min_relax(
        graph, dist, changed, plus_one=True, max_iters=max_levels,
        inf_value=int(inf),
    )
    if not converged:  # pragma: no cover — max_levels default is huge
        import warnings

        warnings.warn(
            f"multi-source BFS hit max_levels={max_levels} before fixpoint; "
            "distances may be upper bounds",
            RuntimeWarning,
            stacklevel=2,
        )
    return dist, int(inf)


def _sparse_threshold(n: int) -> int:
    """Frontier size below which the src-index lookup beats the dense
    |E|-mask gather (~3% of vertices; floor keeps tiny graphs on the
    simpler sparse path). Patched in tests to force the dense path."""
    return max(1024, n // 32)


def frontier_min_relax(
    graph: Graph,
    state: np.ndarray,
    changed: np.ndarray,
    plus_one: bool,
    max_iters: int = 10_000,
    edge_weighted: bool = False,
    inf_value=None,
) -> np.ndarray:
    """Generic frontier-sparse min-relaxation over the CSR blocks.

    Repeatedly applies ``state[dst] = min(state[dst], min over frontier
    in-neighbors u of state[u] (+1 if plus_one))`` until no row
    improves, touching only edges whose src improved in the previous
    round. ``plus_one=True`` is level-synchronous BFS (min-plus);
    ``plus_one=False`` is min-label propagation (connected components);
    ``edge_weighted=True`` adds the block's per-edge weight BEFORE the
    segmented min (weighted SSSP — ``state`` must then be float64, and
    the per-candidate ``d[src] + w`` single add keeps the fixpoint
    bit-identical to the streaming/DataFrame paths).
    ``state`` is an (N, S) integer array (mutated in place and
    returned); ``changed`` is the initial frontier mask.

    ``inf_value`` (unweighted min-plus only) is the caller's
    "unvisited" sentinel; passing it arms the **bottom-up** edge
    selection for fat frontiers (see ``plans.blocks.relax_block`` — the
    Beamer direction-optimizing switch). Values and per-round frontiers
    are bit-identical either way; it is purely an edge-work saver.

    Execution: on local masters with dst-disjoint blocks, ALL rounds run
    inside ONE gang-scheduled barrier job
    (``plans.barrier.run_barrier_min_relax``) — per-round Spark jobs pay
    a fixed ~0.3-0.7 s scheduling + Python-worker round-trip that
    dominates post-peak rounds. Everywhere else (and on any barrier
    failure) each round is its own ``mapInArrow`` job over the same
    ``relax_block`` kernel; the min-plus fixpoint is unique, so both
    paths return identical state.

    Returns ``(state, rounds, converged)`` — ``rounds`` is the number of
    relaxation rounds actually executed and ``converged`` is False only
    when ``max_iters`` ran out while rows were still improving (callers
    surface that instead of silently reporting ``max_iters``).
    """
    import pyarrow as pa

    from approximate_pagerank_public_spark.plans.barrier import (
        barrier_available,
        run_barrier_min_relax,
    )
    from approximate_pagerank_public_spark.plans.blocks import (
        load_block,
        relax_block,
    )

    n = graph.num_vertices
    blocks = graph.blocks
    dtype = state.dtype
    dist = state
    one = dtype.type(1) if plus_one else dtype.type(0)
    bu_inf = inf_value if (plus_one and not edge_weighted) else None

    if barrier_available(graph):
        try:
            out, rounds, converged = run_barrier_min_relax(
                graph,
                state,
                changed,
                one=one,
                edge_weighted=edge_weighted,
                max_iters=max_iters,
                inf_value=bu_inf,
                sparse_threshold=_sparse_threshold(n),
            )
            state[:] = out
            return state, rounds, converged
        except Exception:  # barrier scheduling/retry failure → per-round
            pass

    run_dir = os.path.join(blocks.dir, f"bfs_{uuid.uuid4().hex}")
    os.makedirs(run_dir)
    state_path = f"{run_dir}/dist.npy"
    mask_path = f"{run_dir}/mask.npy"
    front_path = f"{run_dir}/front.npy"
    block_dir = blocks.dir
    pids = blocks.pids
    sc = graph.spark.sparkContext
    k = blocks.num_partitions
    n_tasks = max(1, min(k, sc.defaultParallelism))
    rounds = 0
    converged = False
    try:
        for _level in range(max_iters):
            rounds = _level + 1
            np.save(state_path, dist)
            front = np.flatnonzero(changed)
            # sparse-frontier levels (pre-peak/post-peak: most of a
            # high-diameter traversal, ALL levels of a single-source
            # one) look up frontier vertices' edges through a cached
            # src-sorted index — O(f log E + touched edges) — instead
            # of gathering an |E|-long mask. The dense path stays for
            # peak levels where most vertices changed (and switches
            # per block to bottom-up when the caller armed it).
            sparse = len(front) <= _sparse_threshold(n)
            if sparse:
                np.save(front_path, front)
            else:
                np.save(mask_path, changed)
            front_frac = len(front) / max(1, n)
            out_dir = f"{run_dir}/out"
            os.makedirs(out_dir, exist_ok=True)

            def step(
                batches: Iterator[pa.RecordBatch], sparse: bool = sparse,
                front_frac: float = front_frac,
            ) -> Iterator[pa.RecordBatch]:
                if sparse:
                    front_w = np.load(front_path, mmap_mode="r")
                    mask = None
                else:
                    front_w = None
                    mask = np.load(mask_path, mmap_mode="r")
                state = np.load(state_path, mmap_mode="r")
                done = []
                for b in batches:
                    for task_i in b.column("id").to_pylist():
                        pid = pids[task_i]
                        blk = load_block(block_dir, pid)
                        done.append(pid)
                        res = relax_block(
                            block_dir,
                            pid,
                            blk,
                            state,
                            front=front_w,
                            mask=mask,
                            inf_value=None if sparse else bu_inf,
                            front_frac=None if sparse else front_frac,
                            one=one,
                            edge_weighted=edge_weighted,
                        )
                        if res is None:
                            continue
                        gd, new = res
                        # v before i, both via rename: the driver keys on
                        # i_<pid> existing, so its presence must imply a
                        # complete v_<pid>
                        vt = f"{out_dir}/v_{pid}.{uuid.uuid4().hex}.tmp.npy"
                        np.save(vt, new)
                        os.rename(vt, f"{out_dir}/v_{pid}.npy")
                        it_ = f"{out_dir}/i_{pid}.{uuid.uuid4().hex}.tmp.npy"
                        np.save(it_, gd)
                        os.rename(it_, f"{out_dir}/i_{pid}.npy")
                yield pa.RecordBatch.from_arrays(
                    [pa.array(done, type=pa.int64())], names=["pid"]
                )

            rows = (
                graph.spark.range(0, k, 1, n_tasks)
                .mapInArrow(step, "pid long")
                .collect()
            )
            changed = np.zeros(n, dtype=bool)
            any_imp = False
            for r in rows:
                pid = r["pid"]
                ipath = f"{out_dir}/i_{pid}.npy"
                if not os.path.exists(ipath):
                    continue
                idx = np.load(ipath)
                val = np.load(f"{out_dir}/v_{pid}.npy")
                if blocks.dst_disjoint:
                    dist[idx] = val  # val already = min(cur, cand)
                else:
                    np.minimum.at(dist, idx, val)
                changed[idx] = True  # conservative under overlap: extra
                any_imp = True  # frontier rows re-relax, never miss
            shutil.rmtree(out_dir, ignore_errors=True)
            if not any_imp:
                converged = True
                break
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)
    return dist, rounds, converged
