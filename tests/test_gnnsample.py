"""GNN sampling operators: pure-Python md5 replay goldens, fanout
boundedness, and determinism (operators/gnnsample.py)."""

import hashlib

from approximate_pagerank_public_spark.operators.gnnsample import (
    khop_sample,
    negative_samples,
    sample_in_neighbors,
)


def _draw(seed: str, src: int, dst: int) -> int:
    return int(
        hashlib.md5(f"{seed}:{src}:{dst}".encode()).hexdigest()[:15], 16
    )


def _python_sample(edge_list, k, seed):
    by_dst: dict[int, list[tuple[int, int]]] = {}
    for s, d in edge_list:
        by_dst.setdefault(d, []).append((_draw(seed, s, d), s))
    out = set()
    for d, lst in by_dst.items():
        for _, s in sorted(lst)[:k]:
            out.add((s, d))
    return out


def test_sample_in_neighbors_matches_python_golden(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    edge_list = list(zip(src.tolist(), dst.tolist()))
    want = _python_sample(edge_list, 3, "t")
    got = {
        (r.src, r.dst)
        for r in sample_in_neighbors(g_rand.edges, 3, seed="t").collect()
    }
    assert got == want
    # boundedness + subset
    per_dst: dict[int, int] = {}
    for s, d in got:
        per_dst[d] = per_dst.get(d, 0) + 1
    assert max(per_dst.values()) <= 3
    assert got <= set(edge_list)


def _python_khop(edge_list, roots, fanouts, seed):
    by_dst: dict[int, list[tuple[int, int]]] = {}
    for s, d in edge_list:
        by_dst.setdefault(d, []).append((_draw(seed, s, d), s))
    rows = set()
    seen = {(r, r) for r in roots}
    frontier = [(r, r) for r in roots]
    for hop, k in enumerate(fanouts, start=1):
        nxt = set()
        for root, v in frontier:
            for _, s in sorted(by_dst.get(v, []))[:k]:
                rows.add((root, hop, s, v))
                if (root, s) not in seen:
                    nxt.add((root, s))
        seen |= nxt
        frontier = sorted(nxt)
    return rows


def test_khop_sample_matches_python_golden(g_rand):
    src, dst, _ = g_rand.edges_numpy()
    edge_list = list(zip(src.tolist(), dst.tolist()))
    roots = [0, 7, 42]
    want = _python_khop(edge_list, roots, [3, 2], "t")
    got = {
        (r.root, r.hop, r.src, r.dst)
        for r in khop_sample(g_rand.edges, roots, [3, 2], seed="t").collect()
    }
    assert got == want
    # block volume bound: per root, hop1 ≤ 3, hop2 ≤ 3·2
    for root in roots:
        h1 = sum(1 for rr in got if rr[0] == root and rr[1] == 1)
        h2 = sum(1 for rr in got if rr[0] == root and rr[1] == 2)
        assert h1 <= 3 and h2 <= 6


def test_khop_shared_vertex_samples_identically(g_rand):
    """A vertex reached from two roots must sample the SAME in-edges
    (the draw is root-independent)."""
    got = khop_sample(g_rand.edges, [0, 7, 42], [3, 2], seed="t").collect()
    by_rv: dict[tuple[int, int], frozenset] = {}
    for r in got:
        by_rv.setdefault((r.root, r.dst), set()).add(r.src)
    by_v: dict[int, set] = {}
    for (_, v), srcs in by_rv.items():
        if v in by_v:
            assert by_v[v] == srcs
        else:
            by_v[v] = srcs


def test_negative_samples_golden(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "center int, context int"
    )
    got = negative_samples(pairs, n_vertices=100, n_neg=2, seed="s").collect()
    rows = {(r.center, r.context, r.label) for r in got}
    want = {(1, 2, 1), (3, 4, 1)}
    for c, ctx in [(1, 2), (3, 4)]:
        for j in range(2):
            h = int(
                hashlib.md5(f"s:{c}:{ctx}:{j}".encode()).hexdigest()[:15], 16
            )
            want.add((c, h % 100, 0))
    assert rows == want
    assert len(got) == 2 * 3  # exactly |pairs|·(1+n_neg) rows


def test_weighted_negative_samples_golden(spark):
    """Pure-Python replay of the slot table + md5 draws: weights are
    floor-sqrt chains of capped degree cubes, slots are the exclusive
    cumsum in id order."""
    import math

    from approximate_pagerank_public_spark.operators.gnnsample import (
        weighted_negative_samples,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 1)], "center int, context int"
    )
    degs = {1: 16, 2: 1, 3: 81, 4: 0, 5: 2}
    degrees = spark.createDataFrame(
        list(degs.items()), "id int, degree int"
    )
    got = {
        (r.center, r.context, r.label)
        for r in weighted_negative_samples(
            pairs, degrees, n_neg=2, seed="s"
        ).collect()
    }

    def w_of(d):
        return math.floor(math.sqrt(math.floor(math.sqrt(d * d * d))))

    slots = []
    for v in sorted(k for k, d in degs.items() if d > 0):
        slots.extend([v] * w_of(degs[v]))
    want = {(1, 2, 1), (3, 4, 1), (5, 1, 1)}
    for c, ctx in [(1, 2), (3, 4), (5, 1)]:
        for j in range(2):
            h = int(
                hashlib.md5(f"s:{c}:{ctx}:{j}".encode()).hexdigest()[:15], 16
            )
            want.add((c, slots[h % len(slots)], 0))
    assert got == want
    # degree-0 vertex owns no slots and can never be drawn
    assert all(ctx != 4 for _, ctx, label in got if label == 0)
