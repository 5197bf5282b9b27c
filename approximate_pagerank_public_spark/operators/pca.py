"""First principal component of an embedding column (power iteration).

The training-data-pipeline primitive behind whitening, outlier scoring,
and spectral hashing: project every vector onto the dominant direction
of the corpus covariance. Reference parity: the reference validates
rank orderings produced by iterative float kernels
(`src/common/utils/evaluation_utils.hpp`); this operator follows the
same fixed-iteration-count, replayable-arithmetic discipline.

Algorithm (the algorithm IS the spec — both engines replay it verbatim):

1. Quantize: ``q[t] = floor(double(emb[t]) · 1e6)`` — float32→double is
   exact, floor is exact, so ``q`` is the same BIGINT on any engine.
2. Exact integer moments in ONE distributed pass: per-partition partial
   Gram ``G = QᵀQ``, column sums ``s``, and count ``n`` accumulated in
   int64 NumPy inside ``mapInArrow`` (no per-row Python, no corpus
   shuffle — the only shuffled rows are the P·(d²+d+1) partials).
   Overflow bound: |q| ≤ 1e6·max|emb|, so a partition of R rows is safe
   while R·(1e6·max|emb|)² < 2⁶³ — ~9e6 rows/partition at |emb|≤1 —
   and the global combine sums partition partials, so repartition
   upstream if a single partition would exceed it.
3. Covariance from exact integers with PINNED association:
   ``C[t][u] = (G/n − (s_t/n)·(s_u/n)) / 1e12`` — every input an exact
   integer, every float op in a fixed order → bit-identical cross-engine.
4. Driver-side power iteration on the d×d matrix (d = model dim, a
   constant — this is the legitimately-driver-sized step): start vector
   ``x0[t] = ((t+1)·2654435761 mod 1000003)/1000003 − 0.5`` (integer
   hash, no RNG), then ``iters`` rounds of ``z = C·x; x = z/‖z‖₂`` where
   every matvec row and the norm are SEQUENTIAL left folds in index
   order — matching DuckDB's ``list_reduce(list(... ORDER BY u))``
   term for term, so the oracle replays the whole iteration bit-for-bit.
5. Projection as a pure map: ``pc1_i = (q_i/1e6)·pc − mean·pc`` with the
   row dot a sequential fold (``F.aggregate`` == DuckDB
   ``list_dot_product``, bit-equal — see `_duck_cos`) and the scalar
   ``mean·pc`` folded once on the driver and planted as a literal.

The sign of ``pc1`` is not an eigen-ambiguity: fixed start vector +
fixed iteration count pin it.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_pca(
    embeddings: DataFrame,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """``(vec_id, pc1)`` — per-vector projection onto the first
    principal component (raw double; callers truncate for contracts)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    first = embeddings.select(vec_col).first()
    if first is None or first[0] is None:
        raise ValueError("embeddings is empty")
    dim = len(first[0])

    q = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
                "long"
            ),
        ).alias("q"),
    )

    def gram(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        G = np.zeros((dim, dim), dtype=np.int64)
        s = np.zeros(dim, dtype=np.int64)
        n = 0
        for b in batches:
            flat = (
                b.column(0)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            Q = flat.reshape(-1, dim)
            G += Q.T @ Q
            s += Q.sum(axis=0, dtype=np.int64)
            n += Q.shape[0]
        d32 = np.arange(dim, dtype=np.int32)
        ts = np.concatenate([np.repeat(d32, dim), d32, np.array([-1], np.int32)])
        us = np.concatenate(
            [np.tile(d32, dim), np.full(dim, -1, np.int32), np.array([-1], np.int32)]
        )
        vs = np.concatenate([G.reshape(-1), s, np.array([n], np.int64)])
        yield pa.RecordBatch.from_arrays(
            [pa.array(ts), pa.array(us), pa.array(vs)], names=["t", "u", "v"]
        )

    mom = (
        q.select("q")
        .mapInArrow(gram, "t int, u int, v long")
        .groupBy("t", "u")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    G = np.zeros((dim, dim), dtype=np.int64)
    s = np.zeros(dim, dtype=np.int64)
    n = 0
    for r in mom:
        if r["t"] < 0:
            n = int(r["v"])
        elif r["u"] < 0:
            s[r["t"]] = int(r["v"])
        else:
            G[r["t"]][r["u"]] = int(r["v"])
    if n == 0:
        raise ValueError("embeddings is empty")

    sc2 = float(scale * scale)
    C = [
        [
            (float(G[t][u]) / n - (float(s[t]) / n) * (float(s[u]) / n)) / sc2
            for u in range(dim)
        ]
        for t in range(dim)
    ]
    x = [
        ((t + 1) * 2654435761 % 1000003) / 1000003.0 - 0.5
        for t in range(dim)
    ]
    for _ in range(iters):
        z = []
        for t in range(dim):
            acc = C[t][0] * x[0]
            for u in range(1, dim):
                acc += C[t][u] * x[u]
            z.append(acc)
        acc = z[0] * z[0]
        for t in range(1, dim):
            acc += z[t] * z[t]
        nrm = math.sqrt(acc)
        nrm = nrm if nrm else 1.0
        x = [v / nrm for v in z]
    pc = x
    mean = [(float(s[t]) / n) / float(scale) for t in range(dim)]
    mdot = mean[0] * pc[0]
    for t in range(1, dim):
        mdot += mean[t] * pc[t]

    pc_lit = F.array(*[F.lit(float(v)) for v in pc])
    qd = F.transform(F.col("q"), lambda v: v.cast("double") / F.lit(float(scale)))
    dot = F.aggregate(
        F.zip_with(qd, pc_lit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return q.select("vec_id", (dot - F.lit(float(mdot))).alias("pc1"))
