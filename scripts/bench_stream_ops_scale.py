"""Scale + core-scaling evidence for the event-stream / curation
operators (sessionize, as-of join, dataset_split, skip-gram) on a
synthetic 2·10⁷-row event table.

Unlike the frontier loops (latency-bound per round — see BASELINE.md's
SSSP discussion), these are single-pass scan/window/join workloads —
exactly the shape the north rule's two-cluster-size criterion is about
— so they are the right family to evidence N→4N efficiency on.

The synthetic events table is generated distributedly (spark.range +
xxhash64 arithmetic, no driver data, same table at any parallelism):
``user_id`` Zipf-ish skewed over 200k users (hot users stress the
per-key windows), microsecond timestamps over 30 days, 5 event types.

Usage: python scripts/bench_stream_ops_scale.py [N_CORES] [ROWS]
Runs in-process at local[N]; run twice (8 and 32) via the wrapper loop
below when invoked with no args. Appends to BENCH_STREAM_SCALE.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = int(os.environ.get("STREAM_SCALE_ROWS", 20_000_000))
USERS = 200_000


def synth_events(spark, n: int):
    from pyspark.sql import functions as F

    e = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    h1 = F.xxhash64("id", F.lit(1))
    h2 = F.xxhash64("id", F.lit(2))
    h3 = F.xxhash64("id", F.lit(3))
    # cube-law skew: hot users get a large share (stresses key windows)
    uid = (F.pmod(h1, F.lit(USERS)) * F.pmod(h1, F.lit(USERS)) * F.pmod(h1, F.lit(USERS))) % F.lit(USERS)
    base = 1704067200000000  # 2024-01-01 in us
    ts_us = F.lit(base) + F.pmod(h2, F.lit(30 * 24 * 3600 * 1_000_000))
    et = F.element_at(
        F.array(*[F.lit(x) for x in ["view", "click", "purchase", "signup", "error"]]),
        (F.pmod(h3, F.lit(5)) + 1).cast("int"),
    )
    return e.select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(ts_us).alias("ts"),
        uid.cast("long").alias("user_id"),
        et.alias("event_type"),
        (F.pmod(h3, F.lit(100000)) / 100.0).alias("value"),
    )


def run_once(cores: int, rows: int) -> dict:
    from approximate_pagerank_public_spark.session import get_spark
    from pyspark.sql import functions as F
    from approximate_pagerank_public_spark.operators.events import (
        asof_join,
        session_stats,
    )
    from approximate_pagerank_public_spark.operators.sampling import dataset_split

    spark = get_spark(
        "stream-scale", master=f"local[{cores}]", shuffle_partitions=max(cores, 16)
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev = synth_events(spark, rows)
    ev = ev.persist()
    n = ev.count()  # materialize input once, untimed vs ops

    out: dict = {"cores": cores, "rows": n}

    t0 = time.perf_counter()
    ns = session_stats(ev, gap_seconds=1800).count()
    out["sessionize_sec"] = round(time.perf_counter() - t0, 2)
    out["sessions"] = ns

    left = ev.where(F.col("event_type") == "click")
    right = ev.where(F.col("event_type") == "purchase")
    t0 = time.perf_counter()
    na = asof_join(left, right).where(F.col("asof_value").isNotNull()).count()
    out["asof_sec"] = round(time.perf_counter() - t0, 2)
    out["asof_matched"] = na

    t0 = time.perf_counter()
    nt = dataset_split(ev, id_col="event_id").where("split = 'train'").count()
    out["split_sec"] = round(time.perf_counter() - t0, 2)
    out["train_rows"] = nt

    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) > 1:
        cores = int(sys.argv[1])
        rows = int(sys.argv[2]) if len(sys.argv) > 2 else ROWS
        print(json.dumps(run_once(cores, rows)))
        return
    # wrapper: fresh JVM per level so parallelism is honest
    results = []
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(cores), str(ROWS)],
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    lo, hi = results
    eff = {
        k.replace("_sec", "_efficiency"): round(lo[k] / (4.0 * hi[k]), 3)
        for k in ("sessionize_sec", "asof_sec", "split_sec")
    }
    record = {"levels": results, "efficiency_8_to_32": eff, "rows": ROWS}
    print(json.dumps(record))
    path = os.path.join(REPO, "BENCH_STREAM_SCALE.json")
    hist = []
    if os.path.exists(path):
        hist = json.load(open(path))
    hist.append(record)
    json.dump(hist, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
