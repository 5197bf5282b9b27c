"""Maximal matching: path parity, matching validity, maximality."""

import numpy as np

from approximate_pagerank_public_spark.operators.matching import (
    maximal_matching,
)
from approximate_pagerank_public_spark.operators.triangles import canonical_edges


def test_matching_paths_identical(g_rand):
    b = {(r["u"], r["v"]) for r in maximal_matching(g_rand, mode="broadcast").collect()}
    d = {(r["u"], r["v"]) for r in maximal_matching(g_rand, mode="distributed").collect()}
    assert b == d
    assert b  # g_rand has edges, so the matching is nonempty


def test_matching_valid_and_maximal(g_rand):
    m = {(r["u"], r["v"]) for r in maximal_matching(g_rand, mode="broadcast").collect()}
    matched = set()
    for u, v in m:
        assert u not in matched and v not in matched, "vertex matched twice"
        matched |= {u, v}
    # maximality: every graph edge has ≥1 matched endpoint
    for r in canonical_edges(g_rand).collect():
        assert r["u"] in matched or r["v"] in matched, (
            f"edge ({r['u']}, {r['v']}) has both endpoints free"
        )
