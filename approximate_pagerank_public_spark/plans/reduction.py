"""Deterministic chunked reductions for the superstep stop scalars.

The barrier gang (``plans/barrier.py``) computes the L1/L2 convergence
errors (K5/K6) and the dangling dot product (K2) as per-task partial
sums, while the per-superstep fallback historically computed them in one
pass — two floating-point associations that could disagree by ~1 ulp and,
near the tolerance threshold, stop at *different iterations*.

Both paths now reduce through this module: the vertex axis is cut into
fixed ``CHUNK_ROWS`` chunks (a function of N only — independent of task
count), each chunk is copied to the same C-contiguous ``(S, rows)``
layout before the ufunc reduction (NumPy's pairwise summation order
depends on memory layout, so the copy pins it), and the final combine is
``partials.sum(axis=0)`` over the identical ``(n_chunks, S)`` array.
Result: the stop scalars — and therefore the convergence iteration — are
bit-identical across the barrier gang, the per-superstep loop, and any
task-count, which restores the CLAUDE.md bit-parity invariant for
``tol > 0`` runs.

Reference analogue: the FPGA accumulates the error in a fixed on-chip
reduction tree whose shape never changes between runs
(``multi_personalized_pagerank.cpp:96-108``).
"""

from __future__ import annotations

import numpy as np

# 16k rows x 8 sources x 8 B = 1 MB per chunk copy — L2-resident, and
# small enough that graphs down to |V|~65k still split across 4+ tasks.
CHUNK_ROWS = 16_384


def n_chunks(n: int) -> int:
    return max(1, -(-n // CHUNK_ROWS))


def chunk_bounds(c: int, n: int) -> tuple[int, int]:
    a = c * CHUNK_ROWS
    return a, min(n, (c + 1) * CHUNK_ROWS)


def err_partials(
    new_sn, old_sn, n: int, c0: int, c1: int, err_out: np.ndarray, sq_out: np.ndarray
) -> None:
    """Per-chunk L1/L2 partials of ``new - old`` into rows [c0, c1) of
    the ``(n_chunks, S)`` output arrays.

    ``new_sn``/``old_sn`` are (S, N)-oriented array-likes; views (e.g. a
    transposed (N, S) memmap) are fine — each chunk is copied to
    C-contiguous (S, rows) first so the reduction association is
    layout-independent.
    """
    for c in range(c0, c1):
        a, b = chunk_bounds(c, n)
        d = np.ascontiguousarray(new_sn[:, a:b]) - np.ascontiguousarray(old_sn[:, a:b])
        err_out[c] = np.abs(d).sum(axis=1)
        sq_out[c] = (d * d).sum(axis=1)


def dang_partials(
    state_sn, dang_idx: np.ndarray, n: int, c0: int, c1: int, out: np.ndarray
) -> None:
    """Per-chunk dangling-mass partials (K2): ``Σ state[:, dangling]``
    over each chunk's slice of the sorted dangling-index array."""
    for c in range(c0, c1):
        a, b = chunk_bounds(c, n)
        i0 = np.searchsorted(dang_idx, a)
        i1 = np.searchsorted(dang_idx, b)
        if i0 == i1:
            out[c] = 0.0
            continue
        # advanced indexing always yields a fresh C-contiguous (S, k)
        out[c] = state_sn[:, dang_idx[i0:i1]].sum(axis=1)
