"""NumPy golden implementations — the engine's correctness oracle.

Exact float64 replicas of the reference's CPU golden algorithms; tests
assert the Spark engine matches these at allclose(1e-6), mirroring the
reference's CPU-vs-FPGA validation (``check_array_equality``,
``src/common/utils/utils.hpp:201-213``).

Formulas:

- ``golden_pagerank`` replicates ``PageRankCPU::execute``
  (``src/common/golden_algorithms/pagerank/pagerank_cpu.cpp:25-68``):
  init 1/N; per iteration
  ``pr = α·WᵀT·pr + α/N·(d·pr) + (1-α)/N`` with L1 early exit.
- ``golden_ppr`` replicates ``personalized_pagerank_golden``
  (``src/fpga/src/gold_algorithms.hpp:105-140``): init 1[v=src]; per
  iteration ``pr = α·Wᵀ·pr + α/N·(d·pr) + (1-α)·1[v=src]`` — teleport
  mass goes **only** to the personalization vertex, dangling mass is
  spread uniformly.
- ``golden_multi_ppr`` replicates ``multi_personalized_pagerank_golden``
  (``gold_algorithms.hpp:145-190``): K10 looped over sources.

Graphs are (src, dst, weight) edge arrays with weight already
out-degree-normalized (as the loader does at ``utils.hpp:886-895``).
"""

from __future__ import annotations

import numpy as np


def spmv_gold(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, n: int, vec: np.ndarray
) -> np.ndarray:
    """Pull SpMV: ``out[v] = Σ_{(u,v)} w·vec[u]`` (``gold_algorithms.hpp:3-16``)."""
    out = np.zeros(n, dtype=np.float64)
    np.add.at(out, dst, w * vec[src])
    return out


def dangling_mask_from_edges(src: np.ndarray, n: int) -> np.ndarray:
    mask = np.ones(n, dtype=bool)
    mask[np.unique(src)] = False
    return mask


def golden_pagerank(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    n: int,
    alpha: float = 0.8,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> tuple[np.ndarray, int]:
    dangling = dangling_mask_from_edges(src, n)
    pr = np.full(n, 1.0 / n, dtype=np.float64)
    for it in range(1, max_iter + 1):
        contrib = spmv_gold(src, dst, w, n, pr)
        d = pr[dangling].sum()
        new = alpha * contrib + (alpha / n) * d + (1.0 - alpha) / n
        err = np.abs(new - pr).sum()
        pr = new
        if err <= tol:
            return pr, it
    return pr, max_iter


def golden_ppr(
    src_v: int,
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    n: int,
    alpha: float = 0.8,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> tuple[np.ndarray, int]:
    dangling = dangling_mask_from_edges(src, n)
    pr = np.zeros(n, dtype=np.float64)
    pr[src_v] = 1.0
    for it in range(1, max_iter + 1):
        contrib = spmv_gold(src, dst, w, n, pr)
        d = pr[dangling].sum()
        new = alpha * contrib + (alpha / n) * d
        new[src_v] += 1.0 - alpha
        err = np.abs(new - pr).sum()
        pr = new
        if err <= tol:
            return pr, it
    return pr, max_iter


def golden_multi_ppr(
    sources: list[int],
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    n: int,
    alpha: float = 0.8,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> np.ndarray:
    return np.stack(
        [golden_ppr(s, src, dst, w, n, alpha, tol, max_iter)[0] for s in sources]
    )


def golden_connected_components(
    src: np.ndarray, dst: np.ndarray, n: int
) -> np.ndarray:
    """Weakly connected components by min-label propagation (undirected
    closure); returns per-vertex component label = min vertex id."""
    labels = np.arange(n, dtype=np.int64)
    while True:
        new = labels.copy()
        np.minimum.at(new, dst, labels[src])
        np.minimum.at(new, src, labels[dst])
        if np.array_equal(new, labels):
            return labels
        labels = new


def golden_triangle_count(src: np.ndarray, dst: np.ndarray, n: int) -> int:
    """Exact triangle count on the undirected simple graph."""
    adj: list[set[int]] = [set() for _ in range(n)]
    for u, v in zip(src.tolist(), dst.tolist()):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    count = 0
    for u in range(n):
        for v in adj[u]:
            if v > u:
                count += len([x for x in adj[u] & adj[v] if x > v])
    return count
