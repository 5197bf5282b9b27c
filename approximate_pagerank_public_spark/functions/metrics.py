"""Ranking / validation metrics — the reference's evaluation surface.

Behavioral replicas (reimplemented, not copied) of
``src/common/utils/evaluation_utils.hpp``:

- :func:`sort_ranks` ≙ ``sort_pr`` (``:17-39``): rank desc, ties broken
  by **higher vertex id first**.
- :func:`position_errors` ≙ ``bounded_count_errors`` (``:235-266``).
- :func:`ndcg` ≙ ``normalized_discounted_cumulative_gain`` (``:109-145``):
  relevance of golden position i is ``K-i``; a test vertex's relevance is
  ``K - position_in_test`` if present in the test top-K else 0; both DCG
  and IDCG discount by ``log2(i+2)`` over golden positions.
- :func:`edit_distance` ≙ Levenshtein DP (``:184-231``).
- :func:`top_k_mae` ≙ host-side top-K MAE (``src/fpga/src/host.cpp:301-321``):
  mean |golden−test| score gap over the golden top-K ids.

All operate on driver-side arrays (top-K lists are ≤50 elements); the
distributed part is producing the rank vectors, not comparing them.
"""

from __future__ import annotations

import math

import numpy as np

DEFAULT_BOUNDS = (10, 20, 50)


def sort_ranks(rank: np.ndarray) -> np.ndarray:
    """Vertex ids sorted by rank desc, ties → higher id first."""
    n = len(rank)
    return np.lexsort((-np.arange(n), -rank))


def top_k_ids(rank: np.ndarray, k: int) -> list[int]:
    return sort_ranks(rank)[:k].tolist()


def position_errors(golden: list[int], test: list[int], k: int) -> int:
    return sum(1 for g, t in zip(golden[:k], test[:k]) if g != t)


def ndcg(golden: list[int], test: list[int]) -> float:
    k = len(golden)
    test_rel = {v: k - i for i, v in enumerate(test[:k])}
    dcg = 0.0
    idcg = 0.0
    for i, v in enumerate(golden):
        disc = math.log2(i + 2)
        dcg += test_rel.get(v, 0) / disc
        idcg += (k - i) / disc
    return dcg / idcg


def bounded_ndcg(
    golden: list[int], test: list[int], bounds: tuple[int, ...] = DEFAULT_BOUNDS
) -> dict[int, float]:
    return {b: ndcg(golden[:b], test[:b]) for b in bounds if b <= len(golden)}


def edit_distance(s1: list[int], s2: list[int]) -> int:
    l1, l2 = len(s1), len(s2)
    prev = list(range(l2 + 1))
    for i in range(1, l1 + 1):
        cur = [i] + [0] * l2
        for j in range(1, l2 + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (0 if s1[i - 1] == s2[j - 1] else 1)
            )
        prev = cur
    return prev[l2]


def bounded_edit_distance(
    golden: list[int], test: list[int], bounds: tuple[int, ...] = DEFAULT_BOUNDS
) -> dict[int, int]:
    return {b: edit_distance(golden[:b], test[:b]) for b in bounds if b <= len(golden)}


def top_k_mae(golden_rank: np.ndarray, test_rank: np.ndarray, k: int) -> float:
    ids = sort_ranks(golden_rank)[:k]
    return float(np.abs(golden_rank[ids] - test_rank[ids]).mean())


def evaluate_ranking(
    golden_rank: np.ndarray,
    test_rank: np.ndarray,
    bounds: tuple[int, ...] = DEFAULT_BOUNDS,
) -> dict:
    """Full reference evaluation block (host.cpp:239-376 analogue)."""
    kmax = max(bounds)
    g = top_k_ids(golden_rank, kmax)
    t = top_k_ids(test_rank, kmax)
    return {
        "position_errors": {b: position_errors(g, t, b) for b in bounds},
        "ndcg": bounded_ndcg(g, t, bounds),
        "edit_distance": bounded_edit_distance(g, t, bounds),
        "mae": {b: top_k_mae(golden_rank, test_rank, b) for b in bounds},
    }


def compare_results(golden_ids: list[int], test_ids: list[int]) -> int:
    """Reference V7 ``compare_results`` (`/root/reference/src/common/
    utils/evaluation_utils.hpp:61-107`): count rank-position mismatches
    between a golden ranked-id list and the test ranking, tolerating
    adjacent swaps — when positions i and i+1 are exchanged (a tie
    resolved differently), only the first mismatch counts, the mirror
    position is forgiven.
    """
    errors = 0
    prev_left = 0
    prev_right = 0
    for g, t in zip(golden_ids, test_ids):
        if g != t:
            if prev_left != t or prev_right != g:
                errors += 1
            prev_left, prev_right = g, t
    return errors
