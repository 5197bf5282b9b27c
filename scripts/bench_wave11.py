"""Scale probes for the eleventh-wave operators (one-shot, fresh JVM):

  python scripts/bench_wave11.py bridges     # |V|=1e7 |E|=1e7 G(n,m)
  python scripts/bench_wave11.py twoecc      # same graph, full 2ECC labels
  python scripts/bench_wave11.py hitting     # 8 Jacobi rounds, distributed
  python scripts/bench_wave11.py kcenter     # 200k x 64 synthesized vecs
  python scripts/bench_wave11.py tpch        # Q7/Q8/Q15/Q19 at sf0.1

Each prints one JSON line. The supercritical G(n, m=n) graph gives a
giant component with tree fringes — a realistic bridge-rich shape at
scale (the dense transcript graph has none)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from approximate_pagerank_public_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _graph(spark, n, m):
    from approximate_pagerank_public_spark.plans.graph import Graph
    from approximate_pagerank_public_spark.sources.generators import gnp_edges

    e = gnp_edges(spark, n, m, seed=42).dropDuplicates(["src", "dst"])
    return Graph(e, num_vertices=n)


def main() -> None:
    which = sys.argv[1]
    spark = get_spark(
        f"wave11-{which}", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    out = {"probe": which, "cpus": CPUS}
    t0 = time.time()
    if which in ("bridges", "twoecc"):
        from approximate_pagerank_public_spark.operators.biconnect import (
            bridges,
            two_edge_components,
        )

        n = m = 10_000_000
        g = _graph(spark, n, m)
        ne = g.num_edges
        t0 = time.time()
        if which == "bridges":
            out["n_bridges"] = bridges(g).count()
        else:
            res = two_edge_components(g)
            out["n_components2ec"] = (
                res.agg({"component": "approx_count_distinct"}).first()[0]
            )
        out.update(num_vertices=n, num_edges=ne)
    elif which == "hitting":
        from approximate_pagerank_public_spark.operators.absorbing import (
            hitting_probability,
        )
        from pyspark.sql import functions as F

        n = m = 10_000_000
        g = _graph(spark, n, m)
        ne = g.num_edges
        t0 = time.time()
        res = hitting_probability(g, [0, 1, 2, 3], [4, 5], iters=8)
        out["n_reached"] = res.where(F.col("p") > 0).count()
        out.update(num_vertices=n, num_edges=ne, iters=8)
    elif which == "kcenter":
        from approximate_pagerank_public_spark.operators.similarity import (
            kcenter_seeds,
        )
        from approximate_pagerank_public_spark.sources.synthetic_tables import (
            synthesize_embeddings,
        )

        emb = synthesize_embeddings(spark, n_vecs=200_000, dim=64).localCheckpoint()
        t0 = time.time()
        rows = kcenter_seeds(emb, k=8).collect()
        out.update(n_vecs=200_000, dim=64, seeds=[int(r["vec_id"]) for r in rows])
    elif which == "coverage":
        from approximate_pagerank_public_spark.operators.curation import (
            max_coverage_docs,
        )
        from approximate_pagerank_public_spark.sources.synthetic_tables import (
            synthesize_documents,
        )

        docs = synthesize_documents(spark, n_docs=200_000).localCheckpoint()
        t0 = time.time()
        rows = max_coverage_docs(docs, k=5).collect()
        out.update(
            n_docs=200_000,
            picks=[(int(r["doc_id"]), int(r["new_shingles"])) for r in rows],
        )
    elif which == "containment":
        from approximate_pagerank_public_spark.operators.dedup import (
            containment_pairs,
        )
        from approximate_pagerank_public_spark.sources.synthetic_tables import (
            synthesize_documents,
        )

        docs = synthesize_documents(spark, n_docs=200_000).localCheckpoint()
        t0 = time.time()
        out["n_pairs"] = containment_pairs(docs, threshold_bp=8000).count()
        out["n_docs"] = 200_000
    elif which == "attack":
        from approximate_pagerank_public_spark.operators.graphstats import (
            attack_tolerance,
        )

        n, m = 10_000_000, 20_000_000
        g = _graph(spark, n, m)
        ne = g.num_edges
        t0 = time.time()
        rows = attack_tolerance(g, ks=(0, 16)).collect()
        out.update(
            num_vertices=n,
            num_edges=ne,
            curve=[(int(r["k"]), int(r["giant_size"])) for r in rows],
        )
    elif which == "tpch":
        import __spark_entry__ as E

        for q in ("volume_shipping", "market_share", "top_supplier", "bracket_revenue"):
            t = time.time()
            E.queries()[q](spark, SF_DIR).collect()
            out[q] = round(time.time() - t, 2)
    else:
        raise SystemExit(f"unknown probe {which}")
    out["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
