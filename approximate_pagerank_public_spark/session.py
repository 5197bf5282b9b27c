"""SparkSession factory with scale-oriented defaults.

The engine is designed for a multi-executor cluster reading ~100 TB;
in this sandbox it runs on ``local[N]``. All tuning lives here so tests,
bench and the driver share one config surface.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "approximate-pagerank-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Settings rationale (targets 1000-executor / 100 TB deployments even
    though tests run local):

    - AQE on: runtime coalescing + skew-join splitting for the ETL /
      relational stages. The iterative superstep loop controls its own
      partitioning explicitly (``plans.graph``), so AQE does not destabilize
      it.
    - Arrow enabled with a bounded batch size: the SpMV kernel streams
      per-partition CSR blocks as Arrow batches; 64k rows/batch keeps the
      NumPy working set per task in L2/L3 rather than blowing executor
      memory at scale.
    - shuffle partitions default to 32 locally (``local[32]``); on a real
      cluster set ``spark.sql.shuffle.partitions`` ~ 2-3x total cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # deterministic float behavior for golden parity
        .config("spark.sql.ansi.enabled", "false")
    )
    return builder.getOrCreate()
