"""Drive the driver contract end-to-end, replicating the harness:
run entry(spark), then each queries()[name] at sf0.01 side-by-side with
oracle_sql()[name] in DuckDB, comparing row count, schema (column
names), and order-insensitive values.

Usage: python scripts/drive_contract.py [sf_dir] [only_query ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as E
from approximate_pagerank_public_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

spark = get_spark("drive-contract", master="local[8]", shuffle_partitions=16)

print("== entry(spark) ==", flush=True)
t0 = time.time()
df = E.entry(spark)
rows = df.collect()
print(f"entry: {len(rows)} rows in {time.time()-t0:.1f}s; schema={df.columns}")
for r in rows[:5]:
    print("  ", r)
assert len(rows) > 0

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs = E.queries()
oracles = E.oracle_sql()
fails = []
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        sdf = fn(spark, SF)
        spdf = sdf.toPandas()
    except Exception as ex:
        fails.append((name, f"SPARK ERROR {ex}"))
        print(f"{name:24s} SPARK ERROR: {ex}")
        continue
    el = time.time() - t0
    if name not in oracles:
        print(f"{name:24s} rows-only: {len(spdf):6d} rows  {el:5.1f}s")
        if len(spdf) == 0:
            fails.append((name, "0 rows"))
        continue
    try:
        opdf = con.sql(oracles[name]).df()
    except Exception as ex:
        fails.append((name, f"ORACLE ERROR {ex}"))
        print(f"{name:24s} ORACLE ERROR: {ex}")
        continue
    status = []
    if list(sorted(spdf.columns)) != list(sorted(opdf.columns)):
        status.append(f"SCHEMA {list(spdf.columns)} vs {list(opdf.columns)}")
    if len(spdf) != len(opdf):
        status.append(f"ROWS {len(spdf)} vs {len(opdf)}")
    if not status:
        cols = sorted(spdf.columns)
        a = spdf[cols].sort_values(cols).reset_index(drop=True)
        b = opdf[cols].sort_values(cols).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
        except AssertionError as ex:
            status.append(f"VALUES {str(ex).splitlines()[0]}")
    if status:
        fails.append((name, "; ".join(status)))
        print(f"{name:24s} MISMATCH: {'; '.join(status)}  {el:5.1f}s")
    else:
        print(f"{name:24s} OK ({len(spdf)} rows)  {el:5.1f}s")

print("\n== RESULT ==")
if fails:
    for n, s in fails:
        print(f"FAIL {n}: {s}")
    sys.exit(1)
print("ALL OK")
