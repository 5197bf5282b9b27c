"""Triad census vs an independent brute-force Python golden."""

from itertools import combinations

import numpy as np

from approximate_pagerank_public_spark.operators.triads import (
    LOOKUP,
    TRIAD_LABELS,
    triad_census,
)
from approximate_pagerank_public_spark.plans.graph import Graph


def _brute_census(src, dst, n):
    es = {(a, b) for a, b in zip(src, dst) if a != b}
    counts = {lab: 0 for lab in TRIAD_LABELS}
    for a, b, c in combinations(range(n), 3):
        bits = [
            (a, b) in es, (b, a) in es,
            (a, c) in es, (c, a) in es,
            (b, c) in es, (c, b) in es,
        ]
        code = sum(1 << i for i, x in enumerate(bits) if x)
        counts[LOOKUP[code]] += 1
    return counts


def _census_df_to_dict(df):
    return {r["triad"]: r["n"] for r in df.collect()}


def test_triad_census_matches_bruteforce_random(spark):
    rng = np.random.default_rng(11)
    n, m = 40, 200
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = Graph.from_edge_arrays(spark, src, dst, num_vertices=n, num_partitions=4)
    got = _census_df_to_dict(triad_census(g))
    gold = _brute_census(src.tolist(), dst.tolist(), n)
    assert got == gold
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6
    g.unpersist()


def test_triad_census_prototypes(spark):
    # mutual dyad + isolated vertex -> one 102; chain a->b->c -> 021C
    g = Graph.from_edge_arrays(
        spark, [0, 1, 3, 4], [1, 0, 4, 5], num_vertices=6, num_partitions=2
    )
    got = _census_df_to_dict(triad_census(g))
    gold = _brute_census([0, 1, 3, 4], [1, 0, 4, 5], 6)
    assert got == gold
    assert got["102"] == 4          # {0,1,x} for x in {2,3,4,5}
    assert got["021C"] == 1         # {3,4,5}
    assert sum(got.values()) == 20  # C(6,3)
    g.unpersist()
