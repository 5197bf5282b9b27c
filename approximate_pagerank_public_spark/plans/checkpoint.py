"""Superstep checkpointing with per-partition lineage + metrics.

The north rule requires every superstep to checkpoint vertex-state so a
killed job resumes mid-computation. The reference's closest analogue is
the per-iteration convergence-error series the FPGA kernel writes back
(``multi_personalized_pagerank.cpp:96-108,223-229``); we extend it to a
durable manifest.

Layout under ``<dir>/``:

- ``iter_<k>/ranks.parquet`` — vertex state ``(id, c0..c{S-1})``,
  hash-partitioned by ``id`` (same partitioning the loop uses, so resume
  does not reshuffle);
- ``manifest.json`` — atomically replaced each save:
  ``{"latest": k, "num_vertices", "num_sources", "config",
  "iterations": [{iter, l1_err, sq_l2_err, wall_ms, rows}, ...],
  "lineage": {iter: [{partition, rows}, ...]}}``.

Durable parquet (not ``localCheckpoint``) is used for the resumable
checkpoints; the iterative loops additionally truncate lineage in-memory
every superstep.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@contextmanager
def pinned_confs(spark: SparkSession, confs: dict[str, str]):
    """Pin session confs for the duration of an iterative loop, restoring
    the previous values (or unsetting) on exit.

    The superstep loops manage their own partitioning: the checkpointed
    vertex state must stay hash(id, p)-partitioned so the next
    superstep's shuffle-hash join streams it in place. AQE's partition
    coalescing re-plans the join exchange to fewer partitions (measured:
    32 → 16 at |V|=10⁶), the LogicalRDD then reports the drifted layout,
    and outbox parallelism + join locality degrade superstep over
    superstep — so the loops pin ``coalescePartitions.enabled=false``
    and ``shuffle.partitions=p`` while they run, leaving the relational
    ETL stages (where AQE coalescing is the right call) untouched.
    """
    prev: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def local_ckpt(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """``localCheckpoint()`` plus the storage-RDD ids it materialized.

    ``DataFrame.unpersist()`` is a NO-OP for localCheckpoint storage
    (the blocks live outside the cache manager), so an iterative loop
    that rotates checkpointed state accumulates every superstep's
    blocks until driver GC + ContextCleaner get around to them — at
    ~100 MB+ per superstep that is an escalating-superstep-time leak.
    The returned ids let :func:`free_local_ckpt` drop the blocks
    deterministically.

    Caveats: the id capture diffs ``getRDDStorageInfo`` around the
    checkpoint, so it must not race concurrent persists on the same
    driver (the superstep loops are sequential); and a freed
    localCheckpoint is UNRECOVERABLE (its lineage was truncated) — only
    free state that has been superseded, never the final result.
    """
    sc = df.sparkSession.sparkContext
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    out = df.localCheckpoint()
    after = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    return out, after - before


def free_local_ckpt(spark: SparkSession, ids: set[int]) -> None:
    """Drop the storage blocks of a superseded :func:`local_ckpt`.

    Goes through ``SparkContext.unpersistRDD`` (package-private in
    Scala, public in bytecode) because no public DataFrame API releases
    localCheckpoint blocks."""
    jsc = spark.sparkContext._jsc.sc()
    for rid in ids:
        try:
            jsc.unpersistRDD(rid, False)
        except Exception:  # pragma: no cover — already cleaned
            pass


class CheckpointManager:
    def __init__(self, path: str, every: int = 1):
        self.path = path
        self.every = max(1, every)
        os.makedirs(path, exist_ok=True)
        self._manifest_path = os.path.join(path, "manifest.json")

    # ------------------------------------------------------------ manifest
    def read_manifest(self) -> dict | None:
        if not os.path.exists(self._manifest_path):
            return None
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic

    # ---------------------------------------------------------------- save
    def save(
        self,
        spark: SparkSession,
        iteration: int,
        rank: np.ndarray,
        metrics: list[dict],
        config: dict | None = None,
        num_partitions: int = 32,
    ) -> None:
        """Persist an (S, N) rank block + manifest for iteration k."""
        if iteration % self.every != 0:
            return
        import pandas as pd

        rank2d = np.atleast_2d(rank)
        s, n = rank2d.shape
        pdf = pd.DataFrame({"id": np.arange(n, dtype=np.int64)})
        for i in range(s):
            pdf[f"c{i}"] = rank2d[i]
        df = spark.createDataFrame(pdf).repartition(num_partitions, "id")
        it_dir = os.path.join(self.path, f"iter_{iteration:05d}")
        df.write.mode("overwrite").parquet(os.path.join(it_dir, "ranks.parquet"))
        # per-partition lineage: row count per physical partition
        lineage_rows = (
            df.groupBy(F.spark_partition_id().alias("partition"))
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        manifest = self.read_manifest() or {
            "iterations": [],
            "lineage": {},
        }
        manifest.update(
            {
                "latest": iteration,
                "num_vertices": int(n),
                "num_sources": int(s),
                "num_partitions": int(num_partitions),
                "config": config or manifest.get("config", {}),
                "updated_unix": time.time(),
            }
        )
        manifest["iterations"] = metrics  # caller tracks the full history
        manifest["lineage"][str(iteration)] = [
            {"partition": int(r["partition"]), "rows": int(r["rows"])} for r in lineage_rows
        ]
        self._write_manifest(manifest)

    # ------------------------------------------------------- DataFrame API
    def save_df(
        self,
        ranks,  # DataFrame (id, <state cols...>), already partitioned
        iteration: int,
        metrics: list[dict],
        config: dict | None = None,
    ) -> None:
        """Durable superstep checkpoint for cluster-resident vertex state:
        the DataFrame is written as-is (no driver collect)."""
        if iteration % self.every != 0:
            return
        it_dir = os.path.join(self.path, f"iter_{iteration:05d}")
        ranks.write.mode("overwrite").parquet(os.path.join(it_dir, "ranks.parquet"))
        lineage_rows = (
            ranks.groupBy(F.spark_partition_id().alias("partition"))
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        manifest = self.read_manifest() or {"iterations": [], "lineage": {}}
        manifest.update(
            {
                "latest": iteration,
                "mode": "dataframe",
                "columns": ranks.columns,
                "config": config or manifest.get("config", {}),
                "updated_unix": time.time(),
            }
        )
        manifest["iterations"] = metrics
        manifest["lineage"][str(iteration)] = [
            {"partition": int(r["partition"]), "rows": int(r["rows"])} for r in lineage_rows
        ]
        self._write_manifest(manifest)

    def load_latest_df(self, spark: SparkSession):
        """→ (iteration, ranks DataFrame, metric history) or None."""
        manifest = self.read_manifest()
        if not manifest or "latest" not in manifest:
            return None
        it = manifest["latest"]
        path = os.path.join(self.path, f"iter_{it:05d}", "ranks.parquet")
        return it, spark.read.parquet(path), list(manifest.get("iterations", []))

    # ---------------------------------------------------------------- load
    def load_latest(self, spark: SparkSession) -> tuple[int, np.ndarray, list[dict]] | None:
        """Resume point: (iteration, (S,N) rank block, metric history)."""
        manifest = self.read_manifest()
        if not manifest or "latest" not in manifest:
            return None
        it = manifest["latest"]
        s = manifest["num_sources"]
        n = manifest["num_vertices"]
        path = os.path.join(self.path, f"iter_{it:05d}", "ranks.parquet")
        pdf = spark.read.parquet(path).toPandas()
        pdf = pdf.sort_values("id")
        rank = np.empty((s, n), dtype=np.float64)
        for i in range(s):
            rank[i] = pdf[f"c{i}"].to_numpy(np.float64)
        return it, rank, list(manifest.get("iterations", []))
