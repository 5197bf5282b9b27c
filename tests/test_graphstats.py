"""Assortativity/modularity vs pure-Python goldens."""

import numpy as np
import math
from collections import Counter

from approximate_pagerank_public_spark.operators.graphstats import (
    degree_assortativity,
    modularity,
)
from approximate_pagerank_public_spark.plans.graph import Graph


def _golden_assortativity(src, dst):
    od = Counter(src.tolist())
    ind = Counter(dst.tolist())
    xs = [od[u] for u in src.tolist()]
    ys = [ind[v] for v in dst.tolist()]
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    num = m * sxy - sx * sy
    den = math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
    return num / den


def _golden_modularity(edges, labels):
    und = {(u, v) for u, v in edges if u != v} | {
        (v, u) for u, v in edges if u != v
    }
    rows = list(und)
    m2 = len(rows)
    w = Counter()
    d = Counter()
    for u, v in rows:
        d[labels[u]] += 1
        if labels[u] == labels[v]:
            w[labels[u]] += 1
    sw = sum(w.values())
    sd2 = sum(c * c for c in d.values())
    return (m2 * sw - sd2) / (m2 * m2), len(d)


def test_assortativity_matches_golden(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    gold = _golden_assortativity(src, dst)
    row = degree_assortativity(g_rand).first()
    assert row["m"] == len(src)
    assert abs(row["assortativity"] - gold) < 1e-12


def test_modularity_two_cliques(spark):
    # two 4-cliques joined by one bridge edge
    cl1 = [(u, v) for u in range(4) for v in range(4) if u != v]
    cl2 = [(u + 4, v + 4) for u, v in cl1]
    edges = cl1 + cl2 + [(0, 4)]
    src, dst = zip(*edges)
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=8, num_partitions=4)
    try:
        labels = spark.createDataFrame(
            [(i, 0 if i < 4 else 1) for i in range(8)], "id long, label long"
        )
        gold_q, gold_n = _golden_modularity(edges, {i: int(i >= 4) for i in range(8)})
        row = modularity(g, labels).first()
        assert row["n_communities"] == gold_n
        assert abs(row["modularity"] - gold_q) < 1e-15
        assert row["modularity"] > 0.3  # strong community structure
    finally:
        g.unpersist()


def test_modularity_random_labels_near_zero(g_rand):
    from pyspark.sql import functions as F

    labels = g_rand.vertices.select(
        "id", (F.pmod(F.xxhash64("id"), F.lit(2))).alias("label")
    )
    row = modularity(g_rand, labels).first()
    assert abs(row["modularity"]) < 0.1


def test_contract_communities_counts(spark):
    from approximate_pagerank_public_spark.operators.labelprop import (
        contract_communities,
    )

    # 0→1, 1→0 inside comm A; 2→3 inside comm B; 0→2, 3→1 across
    edges = [(0, 1), (1, 0), (2, 3), (0, 2), (3, 1)]
    src, dst = zip(*edges)
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=4, num_partitions=4)
    try:
        labels = spark.createDataFrame(
            [(0, 0), (1, 0), (2, 2), (3, 2)], "id long, label long"
        )
        got = {
            (r["src_comm"], r["dst_comm"]): r["n_edges"]
            for r in contract_communities(g, labels).collect()
        }
        assert got == {(0, 0): 2, (2, 2): 1, (0, 2): 1, (2, 0): 1}
    finally:
        g.unpersist()


def test_community_conductance_two_triangles(spark):
    from approximate_pagerank_public_spark.operators.graphstats import (
        community_conductance,
    )

    # triangle {0,1,2} + triangle {3,4,5} + bridge (2,3): m2 = 14,
    # vol = 7 per side, cut = 1 per side -> phi = 1/7 exactly
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=6, num_partitions=2)
    labels = spark.createDataFrame(
        [(i, 0 if i < 3 else 3) for i in range(6)], "id long, label long"
    )
    got = (
        community_conductance(g, labels)
        .toPandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
    assert list(got["label"]) == [0, 3]
    assert list(got["vol"]) == [7, 7]
    assert list(got["cut"]) == [1, 1]
    assert (got["conductance"] == 1.0 / 7.0).all()
    g.unpersist()


def test_community_conductance_single_community_empty(spark):
    from approximate_pagerank_public_spark.operators.graphstats import (
        community_conductance,
    )

    edges = [(0, 1), (1, 2), (2, 0)]
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=3, num_partitions=2)
    labels = spark.createDataFrame([(i, 7) for i in range(3)], "id long, label long")
    # one community holds every endpoint: vol == m2, no complement -> no rows
    assert community_conductance(g, labels).count() == 0
    g.unpersist()


def _golden_avg_nbr_degree(src, dst):
    od = Counter(src.tolist())
    per = {}
    for u, v in zip(src.tolist(), dst.tolist()):
        per.setdefault(u, []).append(od.get(v, 0))
    return {
        u: (len(vs), sum(vs), sum(vs) / len(vs)) for u, vs in per.items()
    }


def test_avg_neighbor_degree_matches_golden(g_rand):
    from approximate_pagerank_public_spark.operators.graphstats import (
        avg_neighbor_degree,
    )

    src, dst, _ = g_rand.edges_numpy()
    gold = _golden_avg_nbr_degree(src, dst)
    rows = avg_neighbor_degree(g_rand).collect()
    assert len(rows) == len(gold)
    for r in rows:
        deg, s, avg = gold[r["id"]]
        assert (r["deg"], r["nbr_deg_sum"]) == (deg, s)
        assert abs(r["avg_nbr_deg"] - avg) < 1e-12


def test_reciprocity_explicit(spark):
    from approximate_pagerank_public_spark.operators.graphstats import reciprocity

    # 1<->2 and 4<->5 reciprocated (4 edges); 1->3, 3->4 not (2 edges)
    edges = [(1, 2), (2, 1), (1, 3), (3, 4), (4, 5), (5, 4)]
    src, dst = zip(*edges)
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=6, num_partitions=2)
    row = reciprocity(g).first()
    assert (row["m"], row["reciprocal"]) == (6, 4)
    assert abs(row["reciprocity"] - 4 / 6) < 1e-12
    g.unpersist()


def test_reciprocity_random_matches_golden(g_rand):
    from approximate_pagerank_public_spark.operators.graphstats import reciprocity

    src, dst, _ = g_rand.edges_numpy()
    es = set(zip(src.tolist(), dst.tolist()))
    rec = sum(1 for (u, v) in es if (v, u) in es)
    row = reciprocity(g_rand).first()
    assert (row["m"], row["reciprocal"]) == (len(es), rec)


def _und_edges(src, dst):
    return {
        (min(u, v), max(u, v))
        for u, v in zip(src.tolist(), dst.tolist())
        if u != v
    }


def test_global_transitivity_triangle_plus_tail(spark):
    from approximate_pagerank_public_spark.operators.graphstats import (
        global_transitivity,
    )

    # triangle 1-2-3 plus tail 3->4: T=1, degrees {1:2, 2:2, 3:3, 4:1}
    # wedges = (1+1+3+0) = 5, transitivity = 3/5
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    src, dst = zip(*edges)
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=5, num_partitions=2)
    row = global_transitivity(g).first()
    assert (row["n_triangles"], row["wedges"]) == (1, 5)
    assert abs(row["transitivity"] - 3 / 5) < 1e-12
    g.unpersist()


def test_global_transitivity_matches_golden(g_rand):
    from itertools import combinations

    from approximate_pagerank_public_spark.operators.graphstats import (
        global_transitivity,
    )

    src, dst, _ = g_rand.edges_numpy()
    es = _und_edges(src, dst)
    adj = {}
    for u, v in es:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = sum(
        1
        for u, v in es
        for w in adj[u]
        if w > v and w in adj[v]
    )
    wedges = sum(len(ns) * (len(ns) - 1) // 2 for ns in adj.values())
    row = global_transitivity(g_rand).first()
    assert (row["n_triangles"], row["wedges"]) == (tri, wedges)
    assert abs(row["transitivity"] - 3 * tri / wedges) < 1e-12


def test_rich_club_explicit(spark):
    from approximate_pagerank_public_spark.operators.graphstats import rich_club

    # K4 on {1,2,3,4} plus pendant 4-5: degrees {1:3, 2:3, 3:3, 4:4, 5:1}
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    src, dst = zip(*edges)
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=6, num_partitions=2)
    got = {r["k"]: (r["n_k"], r["e_k"], r["phi"]) for r in rich_club(g).collect()}
    # k=1: club {1,2,3,4} (deg>1) -> 6 edges of K4, phi=1.0
    # k=3: club {4} -> n_k=1 dropped; k=4: empty dropped
    assert got == {1: (4, 6, 1.0)}
    g.unpersist()


def test_rich_club_matches_golden(g_rand):
    from approximate_pagerank_public_spark.operators.graphstats import rich_club

    src, dst, _ = g_rand.edges_numpy()
    es = _und_edges(src, dst)
    deg = Counter()
    for u, v in es:
        deg[u] += 1
        deg[v] += 1
    gold = {}
    for k in sorted(set(deg.values())):
        club = {u for u, d in deg.items() if d > k}
        if len(club) < 2:
            continue
        ek = sum(1 for u, v in es if u in club and v in club)
        gold[k] = (len(club), ek, 2 * ek / (len(club) * (len(club) - 1)))
    rows = rich_club(g_rand).collect()
    got = {r["k"]: (r["n_k"], r["e_k"], r["phi"]) for r in rows}
    assert set(got) == set(gold)
    for k, (n, ek, phi) in gold.items():
        assert (got[k][0], got[k][1]) == (n, ek)
        assert abs(got[k][2] - phi) < 1e-12


def test_degree_gini_regular_and_star(spark):
    from approximate_pagerank_public_spark.operators.graphstats import (
        degree_gini,
    )
    from approximate_pagerank_public_spark.plans.graph import Graph

    # 6-cycle: every vertex total degree 2 -> gini 0
    g = Graph.from_edge_arrays(
        spark,
        list(range(6)),
        [(i + 1) % 6 for i in range(6)],
        num_vertices=6,
        num_partitions=4,
    )
    row = degree_gini(g).first()
    assert (row["n"], row["total_degree"], row["gini"]) == (6, 12, 0.0)
    g.unpersist()

    # star with 5 leaves: degrees [1,1,1,1,1,5]; exact Gini = 1/3
    g = Graph.from_edge_arrays(
        spark, [0] * 5, list(range(1, 6)), num_vertices=6, num_partitions=4
    )
    row = degree_gini(g).first()
    x = sorted([1, 1, 1, 1, 1, 5])
    n = len(x)
    want = (2 * sum((i + 1) * v for i, v in enumerate(x)) - (n + 1) * sum(x)) / (
        n * sum(x)
    )
    assert row["gini"] == want
    g.unpersist()


def test_attack_tolerance_star_plus_triangle(spark):
    from approximate_pagerank_public_spark.operators.graphstats import (
        attack_tolerance,
    )
    from approximate_pagerank_public_spark.plans.graph import Graph

    # hub 0 with leaves 1-4; disjoint triangle 5-6-7
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6), (6, 7), (7, 5)]
    src, dst = zip(*edges)
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=8, num_partitions=4)
    try:
        got = {
            int(r["k"]): (int(r["removed"]), int(r["giant_size"]))
            for r in attack_tolerance(g, ks=(0, 1, 2, 4)).collect()
        }
        # k=1 removes the hub (deg 4) -> triangle survives;
        # k=2 also removes id 5 (deg-2 tie -> smallest id) -> one edge;
        # k=4 removes 0,5,6,7 -> nothing left
        assert got == {0: (0, 5), 1: (1, 3), 2: (2, 2), 4: (4, 0)}
    finally:
        g.unpersist()


def test_random_failure_curve_invariants(spark):
    from approximate_pagerank_public_spark.operators.graphstats import (
        random_failure_curve,
    )
    from approximate_pagerank_public_spark.plans.graph import Graph
    import numpy as np

    rng = np.random.default_rng(3)
    src = rng.integers(0, 60, 300)
    dst = rng.integers(0, 60, 300)
    keep = src != dst
    g = Graph.from_edge_arrays(
        spark, src[keep], dst[keep], num_vertices=60, num_partitions=4
    )
    try:
        rows = {
            int(r["keep_pct"]): (int(r["kept_pairs"]), int(r["giant_size"]))
            for r in random_failure_curve(g, keep_pcts=(100, 50, 25)).collect()
        }
        n_pairs = (
            g.edges.selectExpr("least(src,dst) a", "greatest(src,dst) b")
            .where("a <> b").distinct().count()
        )
        assert rows[100][0] == n_pairs           # keep=100 keeps everything
        assert rows[100][1] >= rows[50][1] >= rows[25][1]  # giant shrinks
        assert rows[50][0] > rows[25][0]          # survivors shrink
    finally:
        g.unpersist()


def test_attack_tolerance_matches_union_find_from_scratch(spark):
    """Randomized pin of the warm-start core: every curve point must
    equal a from-scratch CC over its own survivor set (the incremental
    contraction may only change the WORK, never the values)."""
    import numpy as np

    from approximate_pagerank_public_spark.operators.graphstats import (
        attack_tolerance,
    )
    from approximate_pagerank_public_spark.plans.graph import Graph

    def find(p, x):
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    rng = np.random.default_rng(17)
    n = 200
    src = rng.integers(0, n, 900)
    dst = rng.integers(0, n, 900)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=n, num_partitions=4)
    try:
        ks = (0, 1, 3, 7, 15)
        got = {
            int(r["k"]): int(r["giant_size"])
            for r in attack_tolerance(g, ks=ks).collect()
        }
        deg = np.zeros(n, dtype=np.int64)
        pairs = {(min(a, b), max(a, b)) for a, b in zip(src, dst)}
        for a, b in pairs:
            deg[a] += 1
            deg[b] += 1
        hits = sorted(range(n), key=lambda i: (-deg[i], i))
        for k in ks:
            removed = set(hits[:k])
            surv = [(a, b) for a, b in pairs if a not in removed and b not in removed]
            if not surv:
                assert got[k] == 0
                continue
            par = list(range(n))
            for a, b in surv:
                ra, rb = find(par, a), find(par, b)
                if ra != rb:
                    par[rb] = ra
            used = {v for e in surv for v in e}
            sizes: dict = {}
            for v in used:
                r = find(par, v)
                sizes[r] = sizes.get(r, 0) + 1
            assert got[k] == max(sizes.values()), k
    finally:
        g.unpersist()
