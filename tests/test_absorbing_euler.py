"""Hand goldens: absorbing-walk hitting probability + Euler check."""

import pandas as pd

from approximate_pagerank_public_spark.operators.absorbing import (
    hitting_probability,
)
from approximate_pagerank_public_spark.operators.graphstats import euler_check
from approximate_pagerank_public_spark.plans.graph import Graph


def _probs(df):
    return {int(r["id"]): float(r["p"]) for r in df.collect()}


def test_hitting_probability_dag_golden(spark):
    # 0 -> {1, 2}, 1 -> 2; target 2: every walk ends at 2
    g = Graph.from_edge_arrays(
        spark, [0, 0, 1], [1, 2, 2], num_vertices=3, num_partitions=4
    )
    try:
        got = _probs(hitting_probability(g, [2], iters=8))
        assert got == {0: 1.0, 1: 1.0, 2: 1.0}
        # absorbing competitor at 1 swallows half of 0's mass
        got = _probs(hitting_probability(g, [2], absorb_ids=[1], iters=8))
        assert got == {0: 0.5, 1: 0.0, 2: 1.0}
    finally:
        g.unpersist()


def test_hitting_probability_dangling_dies(spark):
    # 0 -> 1 (dangling), 0 -> 2 (target)
    g = Graph.from_edge_arrays(
        spark, [0, 0], [1, 2], num_vertices=3, num_partitions=4
    )
    try:
        got = _probs(hitting_probability(g, [2], iters=4))
        assert got == {0: 0.5, 1: 0.0, 2: 1.0}
    finally:
        g.unpersist()


def _euler_row(g):
    return euler_check(g).collect()[0]


def test_euler_cycle_has_circuit(spark):
    g = Graph.from_edge_arrays(
        spark, list(range(6)), [(i + 1) % 6 for i in range(6)],
        num_vertices=6, num_partitions=4,
    )
    try:
        r = _euler_row(g)
        assert (r["odd_degree"], r["n_used_components"]) == (0, 1)
        assert r["has_circuit"] and r["has_path"]
    finally:
        g.unpersist()


def test_euler_path_graph_two_odd(spark):
    g = Graph.from_edge_arrays(
        spark, [0, 1, 2], [1, 2, 3], num_vertices=4, num_partitions=4
    )
    try:
        r = _euler_row(g)
        assert (r["odd_degree"], r["n_used_components"]) == (2, 1)
        assert (not r["has_circuit"]) and r["has_path"]
    finally:
        g.unpersist()


def test_euler_disconnected_no_path(spark):
    # two disjoint triangles
    g = Graph.from_edge_arrays(
        spark, [0, 1, 2, 3, 4, 5], [1, 2, 0, 4, 5, 3],
        num_vertices=6, num_partitions=4,
    )
    try:
        r = _euler_row(g)
        assert (r["odd_degree"], r["n_used_components"]) == (0, 2)
        assert (not r["has_circuit"]) and (not r["has_path"])
    finally:
        g.unpersist()
