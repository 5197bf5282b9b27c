"""ANN / similarity search over the embeddings table."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(spark, embeddings):
    q = embeddings.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return q.cache()


def _golden_topk(emb_pdf, q_pdf, k):
    corpus = np.stack(emb_pdf["embedding"].map(np.asarray))
    ids = emb_pdf["vec_id"].to_numpy()
    out = {}
    for _, row in q_pdf.iterrows():
        q = np.asarray(row["query_vec"])
        cos = corpus @ q / (np.linalg.norm(corpus, axis=1) * np.linalg.norm(q))
        order = np.lexsort((ids, -cos))
        out[row["query_id"]] = ids[order][:k].tolist()
    return out


def test_bruteforce_matches_numpy(spark, embeddings, queries):
    k = 10
    res = similarity.cosine_topk_bruteforce(embeddings, queries, k=k).toPandas()
    gold = _golden_topk(embeddings.toPandas(), queries.toPandas(), k)
    for qid, ids in gold.items():
        got = res[res["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert got == ids


def test_self_is_nearest(embeddings, queries):
    res = similarity.cosine_topk_bruteforce(embeddings, queries, k=1).toPandas()
    assert (res["query_id"] == res["vec_id"]).all()


def test_lsh_ann_recall(spark, embeddings, queries):
    dim = len(embeddings.first()["embedding"])
    k = 10
    exact = similarity.cosine_topk_bruteforce(embeddings, queries, k=k).toPandas()
    approx = similarity.lsh_ann_topk(
        embeddings, queries, dim=dim, k=k, bits=4, tables=16
    ).toPandas()
    # recall@10 of LSH vs exact (measured 0.9 at these params on sf0.001)
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.7
    # the query itself always lands in its own bucket
    top1 = approx[approx["rank"] == 1]
    assert (top1["query_id"] == top1["vec_id"]).all()


def _golden_near_dups(emb_pdf, threshold):
    corpus = np.stack(emb_pdf["embedding"].map(np.asarray)).astype(np.float64)
    ids = emb_pdf["vec_id"].to_numpy()
    normed = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    sims = normed @ normed.T
    out = set()
    n = len(ids)
    for i in range(n):
        for j in range(n):
            if ids[i] < ids[j] and sims[i, j] >= threshold - 1e-9:
                out.add((ids[i], ids[j]))
    return out


def test_lsh_ann_bucket_cap_default_and_bounded(spark):
    """The hot-bucket cap is ON by default for lsh_ann_topk (r2 verdict:
    it was the one LSH operator shipping uncapped), and a degenerate
    bucket of identical vectors is truncated to its cap smallest ids."""
    import inspect

    sig = inspect.signature(similarity.lsh_ann_topk)
    assert sig.parameters["max_bucket_size"].default == 10_000

    import pandas as pd

    n, dim = 200, 8
    vec = [1.0] + [0.0] * (dim - 1)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": [vec] * n})
    )
    q = spark.createDataFrame(
        pd.DataFrame({"query_id": [0], "query_vec": [vec]})
    )
    capped = similarity.lsh_ann_topk(
        emb, q, dim=dim, k=n, bits=2, tables=4, max_bucket_size=5
    ).toPandas()
    # every table's bucket holds the same 200 ids → capped to ids 0..4
    assert sorted(capped["vec_id"].tolist()) == list(range(5))
    uncapped = similarity.lsh_ann_topk(
        emb, q, dim=dim, k=n, bits=2, tables=4, max_bucket_size=None
    ).toPandas()
    assert len(uncapped) == n


def test_embedding_near_dups_exact_matches_numpy(spark, embeddings):
    thr = 0.4  # synthetic embeddings have no true dups; low thr yields pairs
    res = similarity.embedding_near_duplicates(embeddings, threshold=thr).toPandas()
    got = set(zip(res["a_id"], res["b_id"]))
    gold = _golden_near_dups(embeddings.toPandas(), thr)
    assert len(gold) > 0  # the test must actually exercise pairs
    assert got == gold
    assert (res["cosine"] >= thr).all()


def test_embedding_near_dups_lsh_subset_of_exact(spark, embeddings):
    thr = 0.4
    dim = len(embeddings.first()["embedding"])
    exact = similarity.embedding_near_duplicates(embeddings, threshold=thr).toPandas()
    lsh = similarity.embedding_near_duplicates(
        embeddings, threshold=thr, method="lsh", dim=dim, bits=2, tables=16
    ).toPandas()
    e = set(zip(exact["a_id"], exact["b_id"]))
    l = set(zip(lsh["a_id"], lsh["b_id"]))
    # every LSH pair is verified with exact cosine -> no false positives
    assert l <= e
    # with 16 tables at 2 bits recall is high on this data
    assert len(e) == 0 or len(l) / len(e) >= 0.7


def test_ivf_exhaustive_probe_equals_bruteforce(spark, embeddings, queries):
    dim = len(embeddings.first()["embedding"])
    k = 10
    exact = similarity.cosine_topk_bruteforce(embeddings, queries, k=k).toPandas()
    ivf = similarity.ivf_ann_topk(
        embeddings, queries, dim=dim, k=k, n_cells=8, n_probe=8
    ).toPandas()
    for qid in exact["query_id"].unique():
        e = exact[exact["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        a = ivf[ivf["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert e == a  # probing every cell == exact search


def test_ivf_ann_recall(spark, embeddings, queries):
    dim = len(embeddings.first()["embedding"])
    k = 10
    exact = similarity.cosine_topk_bruteforce(embeddings, queries, k=k).toPandas()
    ivf = similarity.ivf_ann_topk(
        embeddings, queries, dim=dim, k=k, n_cells=8, n_probe=4
    ).toPandas()
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(ivf[ivf["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6
    top1 = ivf[ivf["rank"] == 1]
    assert (top1["query_id"] == top1["vec_id"]).all()


# ------------------------------------------------------- semantic dedup


def test_semantic_dedup_one_cell_equals_exact_near_dup(spark, embeddings):
    """With a single cell, cluster scoping is vacuous: the pair list must
    equal the exact all-pairs near-dup baseline, cosines bit-identical."""
    exact = (
        similarity.embedding_near_duplicates(embeddings, threshold=0.45)
        .toPandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    sem = (
        similarity.semantic_dedup(embeddings, threshold=0.45, n_cells=1)
        .toPandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    assert (sem["cell"] == 0).all()
    assert sem[["a_id", "b_id"]].values.tolist() == exact[["a_id", "b_id"]].values.tolist()
    assert np.array_equal(sem["cosine"].values, exact["cosine"].values)


def test_semantic_dedup_pairs_are_cell_scoped_subset(spark, embeddings):
    """With real cells: every pair co-locates in the argmax cell, and the
    pair list is exactly the exact near-dup list filtered to co-located
    ids — nothing extra, nothing cross-cluster."""
    n_cells = 8
    sem = similarity.semantic_dedup(
        embeddings, threshold=0.45, n_cells=n_cells
    ).toPandas()
    cents = similarity._train_sample_centroids(
        embeddings, "vec_id", "embedding", n_cells, 5, 4096
    )
    emb = embeddings.toPandas()
    vecs = np.asarray([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    dots = vecs @ np.asarray(cents).T
    cell = {
        int(i): int(np.argmax(d))  # ties -> lower cell, same as _cell_sorted
        for i, d in zip(emb["vec_id"], dots)
    }
    for r in sem.itertuples():
        assert cell[r.a_id] == cell[r.b_id] == r.cell
    exact = similarity.embedding_near_duplicates(embeddings, threshold=0.45).toPandas()
    want = {
        (int(a), int(b))
        for a, b in exact[["a_id", "b_id"]].values
        if cell[int(a)] == cell[int(b)]
    }
    got = {(int(a), int(b)) for a, b in sem[["a_id", "b_id"]].values}
    assert got == want


def test_kmeans_assign_matches_numpy_argmax(spark, embeddings):
    from approximate_pagerank_public_spark.operators.similarity import (
        _train_sample_centroids,
        kmeans_assign,
    )

    n_cells = 4
    got = {
        r["vec_id"]: r["cell"]
        for r in kmeans_assign(embeddings, n_cells=n_cells).collect()
    }
    cents = _train_sample_centroids(
        embeddings, "vec_id", "embedding", n_cells, 5, 4096
    )
    pdf = embeddings.toPandas()
    for _, row in pdf.iterrows():
        v = np.asarray(row["embedding"], dtype=np.float64)
        dots = cents @ v
        # tie rule: dot desc, cell asc
        best = int(np.lexsort((np.arange(len(dots)), -dots))[0])
        assert got[row["vec_id"]] == best, row["vec_id"]
    # every vector got exactly one cell
    assert len(got) == pdf.shape[0]
    assert set(got.values()) <= set(range(n_cells))


def _seqdot(a, b):
    # the engine's F.aggregate fold: left-to-right f64 accumulation
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _pq_replay_codes(pdf, books, m, sd):
    codes = {}
    for _, row in pdf.iterrows():
        v = np.asarray(row["embedding"], dtype=np.float64)
        cs = []
        for i in range(m):
            sub = v[i * sd : (i + 1) * sd]
            d = [
                float(np.dot(c, c)) - 2.0 * _seqdot(sub, c) for c in books[i]
            ]
            best = min(range(len(d)), key=lambda j: (d[j], j))
            cs.append(best)
        codes[row["vec_id"]] = cs
    return codes


def test_pq_encode_matches_replay(spark, embeddings):
    dim = len(embeddings.first()["embedding"])
    m, codes = 4, 8
    books = similarity.pq_train_codebooks(embeddings, dim, m=m, codes=codes)
    got = (
        similarity.pq_encode(embeddings, dim, m=m, codes=codes)
        .toPandas()
        .set_index("vec_id")
    )
    sd = dim // m
    want = _pq_replay_codes(embeddings.toPandas(), books, m, sd)
    assert len(got) == len(want)
    for vid, cs in want.items():
        for i in range(m):
            assert int(got.loc[vid, f"code{i}"]) == cs[i], (vid, i)
    for i in range(m):
        assert got[f"code{i}"].between(0, codes - 1).all()


def test_pq_ann_topk_matches_adc_replay(spark, embeddings, queries):
    dim = len(embeddings.first()["embedding"])
    m, codes, k = 4, 8, 5
    books = similarity.pq_train_codebooks(embeddings, dim, m=m, codes=codes)
    sd = dim // m
    pdf = embeddings.toPandas()
    code_map = _pq_replay_codes(pdf, books, m, sd)
    got = similarity.pq_ann_topk(
        embeddings, queries, dim=dim, k=k, m=m, codes=codes
    ).toPandas()
    for _, qrow in queries.toPandas().iterrows():
        qv = np.asarray(qrow["query_vec"], dtype=np.float64)
        lut = [
            [
                float(np.dot(c, c))
                - 2.0 * _seqdot(qv[i * sd : (i + 1) * sd], c)
                for c in books[i]
            ]
            for i in range(m)
        ]
        scored = []
        for vid, cs in code_map.items():
            adist = lut[0][cs[0]]
            for i in range(1, m):
                adist = adist + lut[i][cs[i]]
            scored.append((adist, vid))
        scored.sort()
        mine = got[got["query_id"] == qrow["query_id"]].sort_values("rank")
        assert mine["vec_id"].tolist() == [v for _, v in scored[:k]]
        for (adist, _), engine_d in zip(scored[:k], mine["adist"]):
            assert engine_d == adist  # bit parity, pre-truncation path
        assert mine["rank"].tolist() == list(range(1, k + 1))


def test_ivfpq_full_probe_equals_pq(spark, embeddings, queries):
    # probing every cell makes the candidate set the whole corpus, so
    # IVF-PQ must return exactly the plain PQ/ADC ranking
    dim = len(embeddings.first()["embedding"])
    n_cells, k = 4, 5
    full = similarity.pq_ann_topk(
        embeddings, queries, dim=dim, k=k, m=4, codes=8
    ).toPandas()
    ivf = similarity.ivfpq_ann_topk(
        embeddings, queries, dim=dim, k=k, n_cells=n_cells,
        n_probe=n_cells, m=4, codes=8,
    ).toPandas()
    cols = ["query_id", "vec_id", "rank"]
    a = full.sort_values(cols).reset_index(drop=True)
    b = ivf.sort_values(cols).reset_index(drop=True)
    assert a[cols].equals(b[cols])
    assert np.array_equal(a["adist"].to_numpy(), b["adist"].to_numpy())


def test_ivfpq_results_are_cell_scoped(spark, embeddings, queries):
    # with n_probe=1 every returned vector must live in the query's own
    # top cell (candidates never leak across unprobed cells)
    dim = len(embeddings.first()["embedding"])
    n_cells = 4
    cells = (
        similarity.kmeans_assign(embeddings, n_cells=n_cells)
        .toPandas()
        .set_index("vec_id")["cell"]
    )
    got = similarity.ivfpq_ann_topk(
        embeddings, queries, dim=dim, k=5, n_cells=n_cells, n_probe=1,
        m=4, codes=8,
    ).toPandas()
    for _, row in got.iterrows():
        assert cells[row["vec_id"]] == cells[row["query_id"]]
