"""HLL sketch: bit-exact vs a pure-Python register replay + accuracy."""

import hashlib

from approximate_pagerank_public_spark.functions.sketch import (
    ALPHA_M2,
    M,
    approx_distinct_hll,
)


def _golden_hll(values):
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        reg = h % M
        w = (h >> 8) & 0xFFFFFFFF
        rho = 33 if w == 0 else 33 - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    s = sum(1.0 / (1 << r) for r in regs.values()) + (M - len(regs))
    return float(ALPHA_M2) / s


def test_hll_bit_exact_vs_python_replay(spark):
    vals = [f"doc-{i}" for i in range(1000)] + [f"doc-{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "text string")
    got = approx_distinct_hll(df, [], "text").first()["approx_distinct"]
    gold = _golden_hll(vals)
    # same registers, same exact power-of-two sum, same single division
    assert got == gold


def test_hll_accuracy_within_sigma(spark):
    n = 5000
    df = spark.createDataFrame([(f"u-{i}",) for i in range(n)], "text string")
    got = approx_distinct_hll(df, [], "text").first()["approx_distinct"]
    # m=256 → relative error σ ≈ 1.04/16 = 6.5%; allow 3σ
    assert abs(got - n) / n < 0.20


def test_hll_groups_independent(spark):
    rows = [("a", f"x-{i}") for i in range(800)] + [
        ("b", f"x-{i}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, text string")
    got = {
        r["g"]: r["approx_distinct"]
        for r in approx_distinct_hll(df, ["g"], "text").collect()
    }
    assert got["a"] == _golden_hll([f"x-{i}" for i in range(800)])
    assert got["b"] == _golden_hll([f"x-{i}" for i in range(50)])
    assert got["a"] > got["b"]
