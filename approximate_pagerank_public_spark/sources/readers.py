"""Table scans.

The engine's external inputs are Iceberg-style tables; in this sandbox
they are parquet directories under ``/root/testdata/sf*``. Reads go
through ``spark.read`` so Catalyst predicate pushdown / column pruning
apply (the moral equivalent of the reference's MatrixMarket scan,
``src/common/utils/utils.hpp:679-724``, which likewise prunes self-loops
on read).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. ``sf_dir`` may point at parquet files or an
    Iceberg warehouse path (``format('iceberg')`` if the path is a
    catalog table); parquet in the sandbox."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
