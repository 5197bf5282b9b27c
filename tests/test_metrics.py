"""Unit checks for the ranking metrics (V1-V5 replicas)."""

import numpy as np

from approximate_pagerank_public_spark.functions.metrics import (
    bounded_edit_distance,
    bounded_ndcg,
    edit_distance,
    ndcg,
    position_errors,
    sort_ranks,
    top_k_mae,
)


def test_sort_ranks_tie_break_higher_id_first():
    # reference sort_pr: ties broken by higher vertex id
    rank = np.array([0.5, 0.2, 0.5, 0.2])
    assert sort_ranks(rank).tolist() == [2, 0, 3, 1]


def test_position_errors():
    assert position_errors([1, 2, 3], [1, 2, 3], 3) == 0
    assert position_errors([1, 2, 3], [1, 3, 2], 3) == 2
    assert position_errors([1, 2, 3], [1, 3, 2], 1) == 0


def test_ndcg_perfect_is_one():
    assert ndcg([5, 3, 1], [5, 3, 1]) == 1.0


def test_ndcg_degrades_with_swaps():
    perfect = ndcg([5, 3, 1], [5, 3, 1])
    swapped = ndcg([5, 3, 1], [3, 5, 1])
    disjoint = ndcg([5, 3, 1], [7, 8, 9])
    assert disjoint == 0.0
    assert 0.0 < swapped < perfect


def test_edit_distance():
    assert edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert edit_distance([1, 2, 3], [1, 3]) == 1
    assert edit_distance([1, 2, 3], [4, 5, 6]) == 3


def test_bounded_variants_respect_bounds():
    g = list(range(50))
    t = list(range(50))
    nd = bounded_ndcg(g, t)
    ed = bounded_edit_distance(g, t)
    assert set(nd) == {10, 20, 50} and all(v == 1.0 for v in nd.values())
    assert all(v == 0 for v in ed.values())
    assert set(bounded_ndcg(g[:15], t[:15])) == {10}


def test_top_k_mae():
    g = np.array([0.4, 0.3, 0.2, 0.1])
    t = np.array([0.4, 0.3, 0.2, 0.1])
    assert top_k_mae(g, t, 4) == 0.0
    t2 = t + 0.01
    assert abs(top_k_mae(g, t2, 4) - 0.01) < 1e-12


def test_compare_results_swap_tolerance():
    from approximate_pagerank_public_spark.functions.metrics import compare_results

    # identical rankings -> 0 errors
    assert compare_results([5, 3, 9, 1], [5, 3, 9, 1]) == 0
    # one adjacent swap counts once (the mirror position is forgiven)
    assert compare_results([5, 3, 9, 1], [3, 5, 9, 1]) == 1
    # two independent swaps -> 2
    assert compare_results([5, 3, 9, 1], [3, 5, 1, 9]) == 2
    # non-swap mismatch chain counts each new divergence
    assert compare_results([1, 2, 3], [4, 5, 6]) == 3
