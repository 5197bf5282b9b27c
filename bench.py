"""Benchmark harness — prints ONE JSON line.

Headline suite (at $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1,
on local[$SPARK_GRAFT_CPUS]):

- q_etl_build        transcripts → edge table (graph build, one-time ETL)
- q_pagerank         PageRank to 1e-6 on the transcript graph (north metric)
- q_multi_ppr8       8-source PPR, fixed 10-iteration budget (FPGA protocol)
- q_cc               connected components (exact)
- q_lpa5             label propagation, 5 rounds
- q_triangles        triangle count
- q_spmv_throughput  20 supersteps × 8 sources (multi-PPR, fixed
                     budget) on a synthetic G(n,m) graph (|V|=1e6,
                     |E|=2e7, reference-protocol analogue) through the
                     engine's fastest path (one gang-scheduled barrier
                     job, plans/barrier.py) — the scaling workload

Extra fields: pagerank iterations/min and edges-traversed/sec for the
north metric; bench_scaling.py reuses q_spmv_throughput at two
parallelism levels for the N→4N scaling-efficiency evidence.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
BENCH_ONLY=q1,q2 (subset), BENCH_SPMV_V/E/ITERS/SOURCES.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ONLY = set(x for x in os.environ.get("BENCH_ONLY", "").split(",") if x)

SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_CONVS = max(200, int(500_000 * SF))  # FIXTURES.md bench scale: sf0.1 → 50k convs

SPMV_V = int(os.environ.get("BENCH_SPMV_V", 1_000_000))
SPMV_E = int(os.environ.get("BENCH_SPMV_E", 20_000_000))
SPMV_ITERS = int(os.environ.get("BENCH_SPMV_ITERS", 20))
SPMV_SOURCES = int(os.environ.get("BENCH_SPMV_SOURCES", 8))


def main() -> None:
    from approximate_pagerank_public_spark.session import get_spark
    from approximate_pagerank_public_spark.plans.graph import Graph
    from approximate_pagerank_public_spark.sources.transcripts import synthesize_transcripts
    from approximate_pagerank_public_spark.sources.generators import gnp_edges
    from approximate_pagerank_public_spark.operators.pagerank import pagerank, multi_ppr
    from approximate_pagerank_public_spark.operators.components import connected_components
    from approximate_pagerank_public_spark.operators.labelprop import label_propagation
    from approximate_pagerank_public_spark.operators.triangles import triangle_count

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 16))
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}
    extra: dict[str, float] = {}

    def run(name, fn):
        if ONLY and name not in ONLY:
            return None
        t0 = time.perf_counter()
        out = fn()
        queries[name] = round(time.perf_counter() - t0, 3)
        return out

    # ---- transcript graph ------------------------------------------------
    graph_box = {}

    def build():
        t = synthesize_transcripts(spark, n_convs=N_CONVS, seed=42)
        g = Graph.from_transcripts(t, num_partitions=max(CPUS, 16))
        g.num_edges  # force materialization
        graph_box["g"] = g
        return g

    run("q_etl_build", build)
    g = graph_box.get("g")
    if g is None:  # subset run that still needs the graph
        need_graph = not ONLY or ONLY & {"q_pagerank", "q_multi_ppr8", "q_cc", "q_lpa5", "q_triangles"}
        if need_graph:
            g = build()

    if g is not None:
        pr_box = {}

        def _pr():
            res = pagerank(g, alpha=0.8, tol=1e-6, max_iter=100)
            pr_box["res"] = res
            return res

        run("q_pagerank", _pr)
        if "res" in pr_box:
            res = pr_box["res"]
            secs = queries["q_pagerank"]
            extra["pagerank_iterations"] = res.iterations
            extra["pagerank_converged"] = bool(res.converged)
            extra["pagerank_iters_per_min"] = round(res.iterations / secs * 60, 2)
            extra["pagerank_edges_per_sec"] = round(g.num_edges * res.iterations / secs, 0)
            extra["graph_vertices"] = g.num_vertices
            extra["graph_edges"] = g.num_edges

        run("q_multi_ppr8", lambda: multi_ppr(g, list(range(8)), tol=0.0, max_iter=10))
        run("q_cc", lambda: connected_components(g).count())
        run("q_lpa5", lambda: label_propagation(g, max_iter=5).count())
        run("q_triangles", lambda: triangle_count(g))

    # ---- triangle count on the reference-shaped pc family ----------------
    def triangles_pc():
        from approximate_pagerank_public_spark.sources.generators import (
            powerlaw_cluster_edges,
        )

        pc = powerlaw_cluster_edges(spark, 100_000, 2_000_000, p_triad=0.1, seed=42)
        gpc = Graph(pc, num_vertices=100_000, num_partitions=max(CPUS, 16))
        t = triangle_count(gpc)
        extra["pc_triangles"] = t
        gpc.unpersist()
        return t

    run("q_triangles_pc", triangles_pc)

    # ---- training-data ops on the driver tables --------------------------
    def dedup_minhash():
        from approximate_pagerank_public_spark.operators.dedup import (
            minhash_lsh_candidates,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        return minhash_lsh_candidates(docs, num_hashes=16, bands=4).count()

    def ann_lsh():
        from pyspark.sql import functions as F
        from approximate_pagerank_public_spark.operators.similarity import lsh_ann_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        dim = len(emb.first()["embedding"])
        q = emb.limit(16).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        return lsh_ann_topk(emb, q, dim=dim, k=10, bits=4, tables=8).count()

    run("q_dedup_minhash", dedup_minhash)
    run("q_ann_lsh", ann_lsh)

    # ---- synthetic SpMV throughput (scaling workload) --------------------
    def spmv_throughput():
        # release the transcript graph's cached edges/blocks first — the
        # throughput number should reflect steady state, not page-cache
        # and worker-pool contention with earlier workloads
        if graph_box.get("g") is not None:
            graph_box["g"].unpersist()
            graph_box["g"] = None
        spark.catalog.clearCache()
        edges = gnp_edges(spark, SPMV_V, SPMV_E, seed=42, skew=0.1)
        # 2x blocks per core: LPT assignment inside the barrier loop
        # balances hub-skewed partitions across the gang
        sg = Graph(edges, num_vertices=SPMV_V, num_partitions=2 * max(CPUS, 8))
        m = sg.num_edges
        srcs = list(range(SPMV_SOURCES))
        # warm-up: CSR block build + barrier worker spawn + page faults
        multi_ppr(sg, srcs, alpha=0.8, tol=0.0, max_iter=2)
        t0 = time.perf_counter()
        res = multi_ppr(sg, srcs, alpha=0.8, tol=0.0, max_iter=SPMV_ITERS)
        el = time.perf_counter() - t0
        steps = [mm["wall_ms"] / 1e3 for mm in res.metrics]
        med = sorted(steps)[len(steps) // 2]
        extra["spmv_edges"] = m
        extra["spmv_sources"] = SPMV_SOURCES
        extra["spmv_supersteps"] = SPMV_ITERS
        extra["spmv_median_superstep_sec"] = round(med, 3)
        extra["spmv_edge_traversals_per_sec"] = round(m * SPMV_ITERS * SPMV_SOURCES / el, 0)
        extra["spmv_edge_traversals_per_sec_median"] = round(m * SPMV_SOURCES / med, 0)
        graph_box["sg"] = sg
        return el

    run("q_spmv_throughput", spmv_throughput)

    # ---- 50-source BFS aggregates (PGX baseline protocol analogue) -------
    def bfs50():
        from approximate_pagerank_public_spark.operators.traversal import bfs_stats

        sg = graph_box.get("sg")
        if sg is None:
            edges = gnp_edges(spark, SPMV_V, SPMV_E, seed=42, skew=0.1)
            sg = Graph(edges, num_vertices=SPMV_V, num_partitions=2 * max(CPUS, 8))
            graph_box["sg"] = sg
        rows = bfs_stats(sg, list(range(50))).collect()
        extra["bfs50_sources"] = len(rows)
        extra["bfs50_max_ecc"] = max(r["ecc"] for r in rows)
        return rows

    run("q_bfs50_ecc_closeness", bfs50)
    if graph_box.get("sg") is not None:
        graph_box["sg"].unpersist()

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": SF,
                "cpus": CPUS,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
