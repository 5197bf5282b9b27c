"""Strongly connected components via distributed forward-coloring +
masked backward reachability (Orzan's coloring algorithm, the standard
Pregel/MapReduce SCC scheme — see also Slota et al.'s FW-BW-Trim).

Beyond the reference (its traversals are BFS-family and its components
are weak); on the DIRECTED transcript graph SCCs are the conversational
feedback loops (user ⇄ assistant ⇄ tool cycles), where weak components
only say "touched the same conversation".

Per outer round, over the still-active subgraph:

1. **forward coloring**: ``color(v) = min id that reaches v`` — min-label
   propagation along edge direction to fixpoint (the CC machinery on the
   unsymmetrized graph).
2. **roots**: vertices with ``color(r) = r``. For each root, its SCC is
   exactly the vertices with color ``r`` that reach ``r``; since all SCC
   members mutually reach each other, the claimed label ``r`` is the
   MINIMUM id in the SCC (any smaller member would have recolored ``r``).
3. **masked backward reachability**: BFS along REVERSED edges from all
   roots simultaneously, traversing only same-color vertices; every
   vertex reached carries ``scc = color``.
4. reached vertices retire; repeat on the remainder.

Outer rounds = length of the longest root-dependency chain — small in
practice (web-scale graphs are one giant SCC plus shallow periphery;
Broder's bow-tie). Both execution paths:

- **broadcast**: driver-resident color/reached arrays; per superstep one
  ``mapInArrow`` job (segmented-min partials for coloring; an
  edge-masked frontier kernel for backward reach). State ships via
  shm/broadcast (``_RankShip``), merge is ``np.minimum.at``/flag-or.
- **distributed**: DataFrame joins + groupBy-min with ``local_ckpt``
  rotation (CLAUDE.md invariant) — vertex state never leaves the
  cluster.

Labels are integer ids propagated by ``min`` — no floats anywhere — so
both paths and the DuckDB transitive-closure oracle are hash-exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from approximate_pagerank_public_spark.plans.checkpoint import (
    free_local_ckpt,
    local_ckpt,
)
from approximate_pagerank_public_spark.plans.graph import Graph

from approximate_pagerank_public_spark.plans.blocks import REV_BLOCKS_MIN_EDGES

_HUGE = np.int64(1) << 62  # inactive-vertex sentinel for min-label passes
_SRC_SCHEMA = StructType([StructField("src", LongType())])


def _back_reach_partials(edges: DataFrame, load_enc) -> DataFrame:
    """Distinct srcs newly reached by one backward step: edge u→v
    relaxes u when v is reached, u is not yet, and both share a color.
    ``load_enc()`` returns the packed state ``enc = color * 2 + reached``
    (colors < 2^62, so the packing is lossless in int64)."""

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        enc = load_enc()
        outs: list[np.ndarray] = []
        for b in batches:
            if b.num_rows == 0:
                continue
            src = b.column("src").to_numpy(zero_copy_only=False)
            dst = b.column("dst").to_numpy(zero_copy_only=False)
            es, ed = enc[src], enc[dst]
            hit = (ed & 1).astype(bool) & ~(es & 1).astype(bool) & (
                (es >> 1) == (ed >> 1)
            )
            if hit.any():
                outs.append(np.unique(src[hit]))
        if not outs:
            return
        yield pa.RecordBatch.from_arrays(
            [pa.array(np.unique(np.concatenate(outs)))], names=["src"]
        )

    return edges.mapInArrow(kernel, _SRC_SCHEMA)


def _reversed_view(edges: DataFrame) -> DataFrame:
    """Transposed edge view — column rename only, no shuffle: the
    kernels below are order-insensitive, so they scan the same cached
    dst-partitioned blocks with src/dst swapped."""
    return edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )


def _masked_back_reach_blocks(
    graph: Graph,
    back_graph: Graph,
    colors: np.ndarray,
    reached: np.ndarray,
    active: np.ndarray,
) -> None:
    """All masked backward-reach rounds on CSR blocks, frontier-sparse.

    ``back_graph``'s blocks must encode the REVERSE of the claim
    direction (so the reach step is a forward src→dst relax there).
    Each round touches only the frontier's out-edges via the cached
    src-sorted permutation (the ``frontier_min_relax`` trick) instead of
    a full edge scan — 27.6 s → ~2 s for the backward phase at 2·10⁷
    edges. Mutates ``reached`` in place."""
    import os
    import shutil
    import uuid

    from approximate_pagerank_public_spark.plans.blocks import load_block

    blocks = back_graph.blocks
    run_dir = os.path.join(blocks.dir, f"scc_{uuid.uuid4().hex}")
    os.makedirs(run_dir)
    enc_path = f"{run_dir}/enc.npy"
    front_path = f"{run_dir}/front.npy"
    block_dir = blocks.dir
    pids = blocks.pids
    sc = graph.spark.sparkContext
    k = blocks.num_partitions
    n_tasks = max(1, min(k, sc.defaultParallelism))
    frontier = np.flatnonzero(reached)
    try:
        while len(frontier):
            enc = np.where(active, colors * 2 + reached, np.int64(-1))
            tmp = f"{enc_path}.{uuid.uuid4().hex}.tmp.npy"
            np.save(tmp, enc)
            os.rename(tmp, enc_path)
            tmp = f"{front_path}.{uuid.uuid4().hex}.tmp.npy"
            np.save(tmp, np.sort(frontier))
            os.rename(tmp, front_path)

            def step(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
                enc_w = np.load(enc_path, mmap_mode="r")
                front_w = np.load(front_path, mmap_mode="r")
                outs: list[np.ndarray] = []
                for b in batches:
                    for task_i in b.column("id").to_pylist():
                        pid = pids[task_i]
                        blk = load_block(block_dir, pid)
                        src_b, _w, udst, starts, segmap, _tb, _sb = blk
                        src_b = np.asarray(src_b)
                        # src-sorted permutation cache (tmp+rename so a
                        # killed task never leaves a truncated file)
                        sp_path = f"{block_dir}/sperm_{pid}.npy"
                        ss_path = f"{block_dir}/ssrc_{pid}.npy"
                        if not os.path.exists(sp_path):
                            perm = np.argsort(src_b, kind="stable")
                            t1 = f"{ss_path}.{uuid.uuid4().hex}.tmp.npy"
                            np.save(t1, src_b[perm])
                            os.rename(t1, ss_path)
                            t2 = f"{sp_path}.{uuid.uuid4().hex}.tmp.npy"
                            np.save(t2, perm)
                            os.rename(t2, sp_path)
                        ss = np.load(ss_path, mmap_mode="r")
                        lo = np.searchsorted(ss, front_w, side="left")
                        hi = np.searchsorted(ss, front_w, side="right")
                        spans = hi - lo
                        nz = spans > 0
                        if not nz.any():
                            continue
                        lo2, sp2 = lo[nz], spans[nz]
                        total = int(sp2.sum())
                        offs = np.repeat(np.cumsum(sp2) - sp2, sp2)
                        idx = np.repeat(lo2, sp2) + np.arange(total) - offs
                        sel = np.asarray(np.load(sp_path, mmap_mode="r"))[idx]
                        # per-edge dst cache (segment map expansion)
                        ed_path = f"{block_dir}/edst_{pid}.npy"
                        if os.path.exists(ed_path):
                            edge_dst = np.load(ed_path, mmap_mode="r")
                        else:
                            seg_len = np.diff(np.r_[np.asarray(starts), len(src_b)])
                            edge_dst = np.repeat(np.asarray(segmap), seg_len)
                            t3 = f"{ed_path}.{uuid.uuid4().hex}.tmp.npy"
                            np.save(t3, edge_dst)
                            os.rename(t3, ed_path)
                        u_ids = np.asarray(udst)[np.asarray(edge_dst)[sel]]
                        ev = enc_w[src_b[sel]]  # frontier side: reached
                        eu = enc_w[u_ids]
                        hit = (
                            (eu >= 0)
                            & ~(eu & 1).astype(bool)
                            & ((eu >> 1) == (ev >> 1))
                        )
                        if hit.any():
                            outs.append(np.unique(u_ids[hit]))
                if outs:
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(np.unique(np.concatenate(outs)))], names=["u"]
                    )

            pdf = (
                graph.spark.range(0, k, 1, n_tasks)
                .mapInArrow(step, "u long")
                .toPandas()
            )
            if not len(pdf):
                break
            newly = pdf["u"].to_numpy(np.int64)
            fresh = newly[~reached[newly]]
            if not len(fresh):
                break
            reached[fresh] = True
            frontier = np.unique(fresh)
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)


def _claim_round_broadcast(
    graph: Graph,
    edges: DataFrame,
    active: np.ndarray,
    scc: np.ndarray,
    ids: np.ndarray,
    back_graph: Graph | None = None,
) -> None:
    """One directional claim: color the active subgraph by min-reaching
    id along ``edges``, then retire every root's SCC via masked
    reverse-reachability (frontier-sparse on ``back_graph``'s blocks
    when provided — they must encode the REVERSE of ``edges``).
    Mutates ``active``/``scc`` in place."""
    from approximate_pagerank_public_spark.operators.components import _min_partials
    from approximate_pagerank_public_spark.operators.spmv import _RankShip

    colors = np.where(active, ids, _HUGE)
    colored = False
    if active.all() and edges is graph.edges and graph.blocks is not None:
        # all-active forward claim (the dominant cost: the giant SCC's
        # coloring) takes the frontier-sparse CSR-block relax — post-peak
        # rounds touch only improved-src edges instead of a full edge
        # pass per round (14 s → ~4 s at sf-bench scale)
        from approximate_pagerank_public_spark.operators.traversal import (
            frontier_min_relax,
        )

        state = colors[:, None].copy()
        out, _rounds, converged = frontier_min_relax(
            graph, state, np.ones(len(colors), dtype=bool), plus_one=False
        )
        if converged:
            colors = out[:, 0]
            colored = True  # relax ran to fixpoint: skip the streaming
            # verify pass (it re-derives the same min, one full edge scan)
        # else: fall through to the streaming fixpoint below (colors
        # unchanged — correctness over speed on pathological inputs)
    while not colored:
        ship = _RankShip(graph.spark, colors)
        try:
            pdf = _min_partials(edges, ship.load).toPandas()
        finally:
            ship.cleanup()
        new = colors.copy()
        if len(pdf):
            np.minimum.at(
                new, pdf["dst"].to_numpy(np.int64), pdf["lbl"].to_numpy(np.int64)
            )
        new[~active] = _HUGE  # inactive dsts take no color
        if np.array_equal(new, colors):
            break
        colors = new
    reached = active & (colors == ids)
    if back_graph is not None and back_graph.blocks is not None:
        _masked_back_reach_blocks(graph, back_graph, colors, reached, active)
        scc[reached] = colors[reached]
        active &= ~reached
        return
    while True:
        # inactive → -1: bit0 set (never relaxed as src), color -1
        # (never matches an active color) — avoids _HUGE*2 overflow
        enc = np.where(active, colors * 2 + reached, np.int64(-1))
        ship = _RankShip(graph.spark, enc)
        try:
            pdf = _back_reach_partials(edges, ship.load).toPandas()
        finally:
            ship.cleanup()
        if not len(pdf):
            break
        newly = pdf["src"].to_numpy(np.int64)
        fresh = newly[~reached[newly]]
        if not len(fresh):
            break
        reached[fresh] = True
    scc[reached] = colors[reached]
    active &= ~reached


def _scc_broadcast(graph: Graph, max_outer: int = 1000) -> np.ndarray:
    n = graph.num_vertices
    active = np.ones(n, dtype=bool)
    scc = np.full(n, -1, dtype=np.int64)
    ids = np.arange(n, dtype=np.int64)
    rev = _reversed_view(graph.edges)
    # reversed-graph BlockStore for the forward claim's backward reach
    # (one extra shuffle + block build, repaid by frontier-sparse reach
    # rounds); the transposed claim's backward reach runs forward on the
    # ORIGINAL blocks, which already exist
    rev_graph: Graph | None = None
    if graph.blocks is not None and graph.num_edges >= REV_BLOCKS_MIN_EDGES:
        # below the threshold the extra shuffle + CSR build costs more
        # than the streaming reach rounds it replaces (measured: sf-bench
        # 240k edges 5.3 s → 7.0 s with, 2·10⁷ edges 42 s → 33 s with);
        # memoized on the Graph so repeated calls reuse the build
        rev_graph = graph.reversed_graph()
    for _outer in range(max_outer):
        if not active.any():
            return scc
        # claim in BOTH directions per round: forward coloring stalls
        # on id-increasing SCC chains (one root per round), its
        # transposed twin retires every local id-minimum at once —
        # together a DAG chain resolves in ~log rounds instead of
        # #SCCs
        _claim_round_broadcast(
            graph, graph.edges, active, scc, ids, back_graph=rev_graph
        )
        if active.any():
            _claim_round_broadcast(
                graph,
                rev,
                active,
                scc,
                ids,
                back_graph=graph if graph.blocks is not None else None,
            )
    raise RuntimeError(
        f"scc exceeded max_outer={max_outer} rounds"
    )  # pragma: no cover — dual-direction rounds « 1000 on any real graph


def _claim_round_distributed(
    graph: Graph, e: DataFrame, active: DataFrame
) -> tuple[DataFrame, list]:
    """One directional claim on DataFrames: min-color ``e`` to fixpoint
    over ``active``, then retire each root's SCC via masked reverse
    frontier joins. Returns localCheckpointed ``(id, scc)`` + its ids."""
    spark = graph.spark
    p = graph.num_partitions
    colors, color_ids = local_ckpt(
        active.withColumn("color", F.col("id")).repartition(p, "id")
    )
    while True:
        incoming = (
            e.join(colors.select(F.col("id").alias("src"), "color"), "src")
            .groupBy("dst")
            .agg(F.min("color").alias("nc"))
        )
        new, new_ids = local_ckpt(
            colors.join(incoming, colors.id == incoming.dst, "left")
            .select(
                "id",
                F.least(F.col("color"), F.coalesce("nc", "color")).alias("color"),
            )
            .repartition(p, "id")
        )
        changed = (
            new.join(colors.withColumnRenamed("color", "_old"), "id")
            .where(F.col("color") != F.col("_old"))
            .count()
        )
        free_local_ckpt(spark, color_ids)
        colors, color_ids = new, new_ids
        if changed == 0:
            break
    reached, reached_ids = local_ckpt(
        colors.where(F.col("color") == F.col("id"))
        .select("id", F.col("id").alias("scc"))
        .repartition(p, "id")
    )
    frontier = reached
    frontier_ids: set | None = None  # initial frontier shares reached's blocks
    while True:
        step = (
            e.join(frontier.select(F.col("id").alias("dst"), "scc"), "dst")
            .join(colors.select(F.col("id").alias("src"), "color"), "src")
            .where(F.col("color") == F.col("scc"))
            .select(F.col("src").alias("id"), "scc")
            .distinct()
            .join(reached.select("id"), "id", "left_anti")
        )
        step, step_ids = local_ckpt(step.repartition(p, "id"))
        if step.limit(1).count() == 0:
            free_local_ckpt(spark, step_ids)
            break
        new_reached, nr_ids = local_ckpt(
            reached.unionAll(step).repartition(p, "id")
        )
        free_local_ckpt(spark, reached_ids)
        if frontier_ids is not None:
            # only now is the previous step superseded as the frontier
            free_local_ckpt(spark, frontier_ids)
        reached, reached_ids = new_reached, nr_ids
        frontier, frontier_ids = step, step_ids
    if frontier_ids is not None:
        free_local_ckpt(spark, frontier_ids)
    free_local_ckpt(spark, color_ids)
    return reached, reached_ids


def _scc_distributed(graph: Graph, max_outer: int = 1000) -> DataFrame:
    spark = graph.spark
    p = graph.num_partitions
    e_all = graph.edges.select("src", "dst")
    active, active_ids = local_ckpt(
        graph.vertices.select("id").repartition(p, "id")
    )
    done: DataFrame | None = None
    done_ids: list = []
    for _outer in range(max_outer):
        if active.limit(1).count() == 0:
            break
        e = (
            e_all.join(active.select(F.col("id").alias("src")), "src")
            .join(active.select(F.col("id").alias("dst")), "dst")
            .select("src", "dst")
        )
        e, e_ids = local_ckpt(e.repartition(p, "src"))
        # dual-direction claims per round (see _scc_broadcast): the
        # reversed view is a column swap over the same checkpointed rows
        for e_dir in (e, e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))):
            if active.limit(1).count() == 0:
                break
            reached, reached_ids = _claim_round_distributed(graph, e_dir, active)
            if done is None:
                done, done_ids = local_ckpt(reached.repartition(p, "id"))
            else:
                nd, nd_ids = local_ckpt(done.unionAll(reached).repartition(p, "id"))
                free_local_ckpt(spark, done_ids)
                done, done_ids = nd, nd_ids
            new_active, na_ids = local_ckpt(
                active.join(reached.select("id"), "id", "left_anti").repartition(
                    p, "id"
                )
            )
            free_local_ckpt(spark, active_ids)
            free_local_ckpt(spark, reached_ids)
            active, active_ids = new_active, na_ids
        free_local_ckpt(spark, e_ids)
    else:  # pragma: no cover
        raise RuntimeError(f"scc exceeded max_outer={max_outer} rounds")
    return done if done is not None else graph.vertices.select(
        "id", F.col("id").alias("scc")
    ).limit(0)


def strongly_connected_components(graph: Graph, mode: str = "auto") -> DataFrame:
    """``(id, scc)`` on the directed graph; ``scc`` = min vertex id in
    the component (singletons label themselves).

    ``mode``: ``broadcast`` (driver-resident arrays, Arrow kernels) or
    ``distributed`` (DataFrame joins, state on-cluster)."""
    from approximate_pagerank_public_spark.operators.pagerank import (
        BROADCAST_MAX_VERTICES,
    )

    if mode == "auto":
        mode = (
            "broadcast"
            if graph.num_vertices <= BROADCAST_MAX_VERTICES
            else "distributed"
        )
    if mode == "broadcast":
        import pandas as pd

        labels = _scc_broadcast(graph)
        pdf = pd.DataFrame(
            {"id": np.arange(len(labels), dtype=np.int64), "scc": labels}
        )
        return graph.spark.createDataFrame(pdf, "id long, scc long")
    return _scc_distributed(graph)


# ----------------------------------------------------------------- bow-tie


def _reach_broadcast(graph: Graph, seed_mask: np.ndarray) -> np.ndarray:
    """Boolean reachability from the seed set along edge direction —
    min-label (0/1) frontier relaxation on the CSR blocks."""
    from approximate_pagerank_public_spark.operators.traversal import (
        frontier_min_relax,
    )

    n = graph.num_vertices
    state = np.ones((n, 1), dtype=np.int32)
    state[seed_mask, 0] = 0
    if graph.num_edges > 0 and seed_mask.any():
        changed = seed_mask.copy()
        state, _rounds, converged = frontier_min_relax(
            graph, state, changed, plus_one=False
        )
        if not converged:  # pragma: no cover
            raise RuntimeError("reach propagation did not converge")
    return state.ravel() == 0


def _reach_distributed(
    spark, edges: DataFrame, seeds: DataFrame, p: int, max_iter: int = 10_000
) -> DataFrame:
    """Distributed frontier reach: per round ONE frontier ⋈ edges join
    + distinct + anti-join against the visited set (``local_ckpt``
    rotation).  Returns the visited ``(id)`` set including seeds."""
    from approximate_pagerank_public_spark.plans.checkpoint import (
        free_local_ckpt,
        local_ckpt,
    )

    reached, r_ids = local_ckpt(seeds.select("id").repartition(p, "id"))
    frontier, f_ids = reached, None
    try:
        for _ in range(max_iter):
            nxt, n_ids = local_ckpt(
                edges.join(
                    frontier.select(F.col("id").alias("src")), "src"
                )
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(reached, "id", "left_anti")
                .repartition(p, "id")
            )
            if f_ids is not None:
                free_local_ckpt(spark, f_ids)
            frontier, f_ids = nxt, n_ids
            if nxt.count() == 0:
                free_local_ckpt(spark, n_ids)
                return reached
            new_reached, nr_ids = local_ckpt(
                reached.unionAll(nxt).repartition(p, "id")
            )
            free_local_ckpt(spark, r_ids)
            reached, r_ids = new_reached, nr_ids
    except Exception:
        # release loop state on the error path (local_ckpt invariant:
        # DataFrame.unpersist is a no-op for localCheckpoint blocks)
        if f_ids is not None and f_ids is not r_ids:
            free_local_ckpt(spark, f_ids)
        free_local_ckpt(spark, r_ids)
        raise
    if f_ids is not None:
        free_local_ckpt(spark, f_ids)
    free_local_ckpt(spark, r_ids)
    raise RuntimeError(  # pragma: no cover
        f"reach propagation did not converge in {max_iter} rounds"
    )


def bowtie_decomposition(graph: Graph, mode: str = "auto") -> DataFrame:
    """``(id, cls)`` — the Broder et al. (2000) bow-tie map of a
    directed graph: ``CORE`` (largest SCC, ties → smaller label),
    ``OUT`` (reachable from the core), ``IN`` (reaches the core),
    ``TENDRIL`` (rest of the core's weak component — includes Broder's
    tubes), ``DISCONNECTED`` (everything else).  The canonical
    structural census of a web-scale link graph.

    Composition of existing scale paths: one SCC pass, two directed
    reachability passes (forward + on the reversed graph), one weak-CC
    pass, then a single codegen'd CASE projection.  Modes mirror
    ``strongly_connected_components``."""
    from approximate_pagerank_public_spark.operators.pagerank import (
        BROADCAST_MAX_VERTICES,
    )

    spark, p = graph.spark, graph.num_partitions
    if mode == "auto":
        mode = (
            "broadcast"
            if graph.num_vertices <= BROADCAST_MAX_VERTICES
            else "distributed"
        )
    if mode == "broadcast":
        import pandas as pd

        from approximate_pagerank_public_spark.operators.components import (
            _cc_broadcast,
        )

        labels = _scc_broadcast(graph)
        uniq, counts = np.unique(labels, return_counts=True)
        core = int(uniq[np.lexsort((uniq, -counts))[0]])
        core_mask = labels == core
        fwd = _reach_broadcast(graph, core_mask)
        bwd = _reach_broadcast(graph.reversed_graph(), core_mask)
        und = graph.undirected()
        try:
            # max_iter = |V| guarantees fixpoint (min-label propagation
            # converges within the weak diameter < |V|); a fixed 200 cap
            # could silently misclassify TENDRIL/DISCONNECTED on a
            # high-diameter weak component (it only warned).  The
            # relaxation is frontier-sparse, so the bound is free.
            wcc, _ = _cc_broadcast(und, max(200, graph.num_vertices))
        finally:
            und.unpersist()
        corewc = int(wcc[int(np.flatnonzero(core_mask).min())])
        cls = np.where(
            core_mask,
            "CORE",
            np.where(
                fwd,
                "OUT",
                np.where(
                    bwd,
                    "IN",
                    np.where(wcc == corewc, "TENDRIL", "DISCONNECTED"),
                ),
            ),
        )
        pdf = pd.DataFrame(
            {"id": np.arange(len(labels), dtype=np.int64), "cls": cls}
        )
        return spark.createDataFrame(pdf, "id long, cls string")

    from approximate_pagerank_public_spark.operators.components import (
        connected_components,
    )

    scc_df = strongly_connected_components(graph, mode="distributed")
    scc_df = scc_df.localCheckpoint()
    sizes = scc_df.groupBy("scc").agg(F.count("*").alias("n"))
    core = int(
        sizes.orderBy(F.col("n").desc(), F.col("scc").asc()).first()["scc"]
    )
    seeds = scc_df.where(F.col("scc") == core).select("id")
    fwd = _reach_distributed(spark, graph.edges, seeds, p).select(
        "id", F.lit(True).alias("fwd")
    )
    rev_e = graph.edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    bwd = _reach_distributed(spark, rev_e, seeds, p).select(
        "id", F.lit(True).alias("bwd")
    )
    wcc = connected_components(graph, mode="star")
    corewc = int(
        wcc.join(seeds.orderBy("id").limit(1), "id").first()["component"]
    )
    return (
        scc_df.join(fwd, "id", "left")
        .join(bwd, "id", "left")
        .join(wcc, "id", "left")
        .select(
            "id",
            F.when(F.col("scc") == core, "CORE")
            .when(F.col("fwd"), "OUT")
            .when(F.col("bwd"), "IN")
            .when(F.col("component") == corewc, "TENDRIL")
            .otherwise("DISCONNECTED")
            .alias("cls"),
        )
    )


def dag_longest_path(
    edges: DataFrame,
    nodes: DataFrame,
    max_iter: int = 10_000,
) -> DataFrame:
    """``(id, longest)`` — longest path (in edges) ENDING at each node
    of a DAG, by max-plus frontier relaxation: per round ONE edges ⋈
    state join + a map-side-combinable ``groupBy(dst).max`` + a
    greatest() merge, ``local_ckpt`` rotation; rounds = DAG depth.
    Raises if ``max_iter`` rounds still improve (a cycle — the caller
    promised a DAG, e.g. the SCC condensation)."""
    from approximate_pagerank_public_spark.plans.checkpoint import (
        free_local_ckpt,
        local_ckpt,
    )

    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    state, s_ids = local_ckpt(
        nodes.select("id", F.lit(0).cast("long").alias("d")).repartition(p, "id")
    )
    for _ in range(max_iter):
        cand = (
            edges.join(state.select(F.col("id").alias("src"), "d"), "src")
            .groupBy("dst")
            .agg((F.max("d") + 1).alias("nd"))
            .select(F.col("dst").alias("id"), "nd")
        )
        new, n_ids = local_ckpt(
            state.join(cand, "id", "left")
            .select("id", F.greatest("d", "nd").alias("d"))
            .repartition(p, "id")
        )
        improved = (
            new.join(state.withColumnRenamed("d", "_old"), "id")
            .where(F.col("d") > F.col("_old"))
            .count()
        )
        free_local_ckpt(spark, s_ids)
        state, s_ids = new, n_ids
        if improved == 0:
            return state.withColumnRenamed("d", "longest")
    raise RuntimeError(  # pragma: no cover — DAG depth << max_iter
        f"dag_longest_path still improving after {max_iter} rounds — "
        "input has a cycle"
    )
