"""Rendezvous (highest-random-weight) sharding — deterministic,
minimally-disruptive key→shard assignment (Thaler & Ravishankar 1998).

The placement primitive of a 100-TB pipeline: route documents /
conversations / vertices to N workers so that (a) the assignment is a
pure function of the key (no coordination state), (b) load splits
~uniformly, and (c) changing N → N+1 moves only ~1/(N+1) of the keys
(unlike ``hash(key) mod N``, which reshuffles almost everything —
property-tested).

Assignment: ``shard(key) = argmax_s md5("s:key")`` over the same md5
family every oracle here replays. The argmax is ONE integer
``greatest(...)`` over per-shard codes ``w·64 + (63 − s)`` with a
56-bit weight (14 md5 hex chars) — w·64+63 ≤ 2⁶² so the code never
overflows BIGINT, ties break toward the smaller shard id, and the
whole operator is a pure JVM-side projection: no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_SHARDS = 64


def _code(value_col: str, shard: int):
    payload = F.concat_ws(
        ":", F.lit(str(shard)), F.col(value_col).cast("string")
    )
    w = F.conv(F.substring(F.md5(payload), 1, 14), 16, 10).cast("long")
    return w * F.lit(MAX_SHARDS) + F.lit(MAX_SHARDS - 1 - shard)


def hrw_assign(
    df: DataFrame, key_col: str, num_shards: int, out_col: str = "shard"
) -> DataFrame:
    """Adds ``out_col``: the rendezvous shard (0..num_shards-1) of each
    row's key. Pure projection — no shuffle."""
    if not 1 <= num_shards <= MAX_SHARDS:
        raise ValueError(f"num_shards must be in 1..{MAX_SHARDS}")
    best = F.greatest(*[_code(key_col, s) for s in range(num_shards)]) if (
        num_shards > 1
    ) else _code(key_col, 0)
    shard = F.lit(MAX_SHARDS - 1) - F.pmod(best, F.lit(MAX_SHARDS))
    return df.withColumn(out_col, shard.cast("int"))


def hrw_oracle_sql(key_expr: str, num_shards: int) -> str:
    """The shard expression in DuckDB — same weights, same encoding."""
    codes = ", ".join(
        "CAST('0x' || substr(md5('"
        + str(s)
        + ":' || "
        + key_expr
        + "), 1, 14) AS BIGINT) * "
        + str(MAX_SHARDS)
        + " + "
        + str(MAX_SHARDS - 1 - s)
        for s in range(num_shards)
    )
    return (
        f"CAST({MAX_SHARDS - 1} - (greatest({codes}) % {MAX_SHARDS}) AS INT)"
    )
