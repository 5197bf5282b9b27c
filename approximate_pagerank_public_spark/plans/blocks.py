"""Per-partition CSR blocks — materialized once, reused every superstep.

This is the engine's equivalent of the reference keeping the packed COO
stream resident in device memory across all iterations
(``pagerank_coo.cpp:69-89`` transfers once; the kernel then loops
``max_iter`` times on-chip). In Spark terms: streaming the cached edge
DataFrame through the JVM→Arrow→Python boundary *every* superstep costs
~0.5 GB of serialization per 20M edges; instead we pay it once, writing
each partition's dst-sorted CSR arrays (``src``, ``weight``, unique
``dst``, segment ``starts``) to shared memory (``/dev/shm``), and every
subsequent superstep is a tiny one-value-per-task job whose kernel
mmaps its block, mmaps the rank vector, computes
``np.add.reduceat(rank[:, src] * w, starts)`` and writes the partial
back to shared memory. No per-row Python, no JVM data path, no shuffle.

Scale note: this fast path engages on ``local[*]`` masters where all
Python workers share the driver's /dev/shm. On a multi-node cluster the
same blocks would live on executor-local disk with locality-aware
scheduling (RDD preferred locations); the engine then falls back to the
streaming ``mapInArrow`` kernel in ``operators/spmv.py``, which is
identical math with a per-superstep serialization cost instead.

Block manifest rows double as the per-partition lineage the checkpoint
manifest records.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

_SHM_DIR = os.environ.get("SPARK_GRAFT_SHM", "/dev/shm")

_MANIFEST_SCHEMA = "pid long, n_edges long, n_dst long"


def shm_available(spark: SparkSession) -> bool:
    return spark.sparkContext.master.startswith("local") and os.path.isdir(_SHM_DIR)


class BlockStore:
    """CSR blocks for one Graph, keyed by edge-partition id."""

    def __init__(self, spark: SparkSession, edges: DataFrame):
        self.spark = spark
        self.dir = os.path.join(_SHM_DIR, f"apr_blocks_{uuid.uuid4().hex}")
        os.makedirs(self.dir, exist_ok=True)
        block_dir = self.dir

        def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            srcs, dsts, ws = [], [], []
            for b in batches:
                if b.num_rows:
                    srcs.append(b.column("src").to_numpy(zero_copy_only=False))
                    dsts.append(b.column("dst").to_numpy(zero_copy_only=False))
                    ws.append(b.column("weight").to_numpy(zero_copy_only=False))
            if not srcs:
                return
            src = np.concatenate(srcs)
            dst = np.concatenate(dsts)
            w = np.concatenate(ws)
            order = np.argsort(dst, kind="stable")  # partitions are dst-sorted
            src, dst, w = src[order], dst[order], w[order]  # already; cheap safety
            starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
            u_dst = dst[starts]
            # separate .npy per array → np.load(mmap_mode='r') in the
            # superstep kernel is a zero-copy shm mapping (npz archives
            # cannot be mmapped and would be re-read every superstep)
            np.save(os.path.join(block_dir, f"part_{pid}_src.npy"), src.astype(np.int64))
            np.save(os.path.join(block_dir, f"part_{pid}_w.npy"), w.astype(np.float64))
            np.save(os.path.join(block_dir, f"part_{pid}_udst.npy"), u_dst.astype(np.int64))
            np.save(os.path.join(block_dir, f"part_{pid}_starts.npy"), starts.astype(np.int64))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([pid], type=pa.int64()),
                    pa.array([len(src)], type=pa.int64()),
                    pa.array([len(u_dst)], type=pa.int64()),
                ],
                names=["pid", "n_edges", "n_dst"],
            )

        self.manifest = edges.mapInArrow(build, _MANIFEST_SCHEMA).toPandas()
        self.pids = self.manifest["pid"].tolist()
        self.num_partitions = len(self.pids)
        # cache each block's u_dst on the driver for the merge step
        self._u_dst = {
            pid: np.load(os.path.join(self.dir, f"part_{pid}_udst.npy"), mmap_mode="r")
            for pid in self.pids
        }

    # ----------------------------------------------------------- supersteps
    def gather(self, rank2d: np.ndarray, op: str = "sum") -> np.ndarray:
        """One superstep over all blocks; ``op`` is 'sum' (weighted SpMV)
        or 'min' (label propagation on int64 labels)."""
        n = rank2d.shape[-1]
        is_min = op == "min"
        if self.num_partitions == 0:  # empty graph
            return rank2d.copy() if is_min else np.zeros_like(rank2d)
        rank_path = os.path.join(self.dir, f"state_{uuid.uuid4().hex}.npy")
        # ship N-major (N, S): the per-edge gather then reads one
        # contiguous S·8-byte row per edge (one cache line for S=8)
        # instead of S scattered reads — measured ~10x faster
        np.save(rank_path, rank2d if is_min else np.ascontiguousarray(rank2d.T))
        out_dir = os.path.join(self.dir, f"out_{uuid.uuid4().hex}")
        os.makedirs(out_dir, exist_ok=True)
        block_dir = self.dir
        pids = self.pids

        def step(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            done = []
            for b in batches:
                for pid in b.column("id").to_pylist():
                    pid = pids[pid]
                    pre = os.path.join(block_dir, f"part_{pid}")
                    src = np.load(f"{pre}_src.npy", mmap_mode="r")
                    starts = np.load(f"{pre}_starts.npy", mmap_mode="r")
                    state = np.load(rank_path, mmap_mode="r")
                    if is_min:
                        incoming = state[src]
                        p = np.minimum.reduceat(incoming, starts)
                    else:
                        w = np.load(f"{pre}_w.npy", mmap_mode="r")
                        contrib = state[src, :] * np.asarray(w)[:, None]  # (Eb, S)
                        p = np.add.reduceat(contrib, starts, axis=0)  # (K, S)
                    np.save(os.path.join(out_dir, f"p_{pid}.npy"), p)
                    done.append(pid)
            yield pa.RecordBatch.from_arrays(
                [pa.array(done, type=pa.int64())], names=["pid"]
            )

        k = self.num_partitions
        rows = (
            self.spark.range(0, k, 1, k).mapInArrow(step, "pid long").collect()
        )
        done_pids = {r["pid"] for r in rows}
        try:
            if is_min:
                out = rank2d.copy()
                for pid in done_pids:
                    p = np.load(os.path.join(out_dir, f"p_{pid}.npy"))
                    np.minimum.at(out, self._u_dst[pid], p)
            else:
                out_ns = np.zeros((n, rank2d.shape[0]), dtype=np.float64)
                for pid in done_pids:
                    p = np.load(os.path.join(out_dir, f"p_{pid}.npy"))  # (K, S)
                    np.add.at(out_ns, self._u_dst[pid], p)
                out = np.ascontiguousarray(out_ns.T)
            return out
        finally:
            os.unlink(rank_path)
            shutil.rmtree(out_dir, ignore_errors=True)

    def cleanup(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)
