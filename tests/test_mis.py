"""Luby MIS (operators/mis.py) vs a pure-Python replay."""

import hashlib
from collections import defaultdict

from approximate_pagerank_public_spark.operators.mis import maximal_independent_set


def _py_luby(src, dst, n, seed="mis"):
    nbrs = defaultdict(set)
    for a, b in zip(src, dst):
        if a != b:
            nbrs[int(a)].add(int(b))
            nbrs[int(b)].add(int(a))
    active = set(range(n))
    mis = set()
    rnd = 0
    while active:
        rnd += 1
        pr = {
            v: hashlib.md5(f"{seed}:{rnd}:{v}".encode()).hexdigest()
            + str(v).zfill(12)
            for v in active
        }
        sel = {
            v
            for v in active
            if all(pr[v] < pr[u] for u in nbrs[v] if u in active)
        }
        rm = set(sel)
        for v in sel:
            rm |= nbrs[v] & active
        active -= rm
        mis |= sel
    return mis, rnd


def test_mis_matches_python_replay(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    gold, gold_rounds = _py_luby(src, dst, 300)
    res = maximal_independent_set(g_rand)
    got = {r["id"] for r in res.labels.collect() if r["in_mis"]}
    assert got == gold
    assert res.rounds == gold_rounds


def test_mis_independent_and_maximal(g5):
    src, dst = [1, 1, 2, 2, 3, 4], [0, 3, 0, 1, 2, 3]
    res = maximal_independent_set(g5)
    mis = {r["id"] for r in res.labels.collect() if r["in_mis"]}
    edges = set(zip(src, dst)) | set(zip(dst, src))
    # independence: no edge inside the MIS
    assert not any((a, b) in edges for a in mis for b in mis if a != b)
    # maximality: every outsider has a MIS neighbor
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
    for v in set(range(5)) - mis:
        assert nbrs[v] & mis, v


def test_mis_deterministic_across_runs(g5):
    a = sorted(
        (r["id"], r["in_mis"])
        for r in maximal_independent_set(g5).labels.collect()
    )
    b = sorted(
        (r["id"], r["in_mis"])
        for r in maximal_independent_set(g5).labels.collect()
    )
    assert a == b
