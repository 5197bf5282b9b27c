"""Decontamination + repetition-signal goldens (operators/curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.operators.curation import (
    ngram_contamination,
    repetition_stats,
    split_contamination,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_contamination_counts_exactly(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps"),
            (2, "pack my box with five dozen jugs"),
            (3, "the quick brown cat sleeps"),
        ],
    )
    ev = _docs(
        spark,
        [
            # 3-grams: {the quick brown, quick brown fox, brown fox naps}
            # first occurs in train docs 1 AND 3; second in doc 1 only.
            (100, "the quick brown fox naps"),
            # no 3-gram overlap at all
            (101, "completely novel words here now"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in ngram_contamination(ev, train, n=3, max_shingle_df=None).collect()
    }
    r = out[100]
    assert r["total_ngrams"] == 3
    assert r["matched_ngrams"] == 2
    assert r["matched_train_docs"] == 2  # docs 1 and 3
    assert r["contamination"] == pytest.approx(2 / 3)
    r = out[101]
    assert r["total_ngrams"] == 3
    assert r["matched_ngrams"] == 0
    assert r["matched_train_docs"] == 0
    assert r["contamination"] == 0.0


def test_ngram_contamination_df_cap_drops_boilerplate(spark):
    # "a b c" appears in 3 train docs -> dropped at max_shingle_df=2,
    # so the eval doc's only hit disappears.
    train = _docs(spark, [(1, "a b c x"), (2, "a b c y"), (3, "a b c z")])
    ev = _docs(spark, [(9, "a b c")])
    uncapped = ngram_contamination(ev, train, n=3, max_shingle_df=None).collect()[0]
    assert uncapped["matched_ngrams"] == 1
    assert uncapped["matched_train_docs"] == 3
    capped = ngram_contamination(ev, train, n=3, max_shingle_df=2).collect()[0]
    assert capped["matched_ngrams"] == 0
    assert capped["matched_train_docs"] == 0


def test_ngram_contamination_short_doc_degenerate_shingle(spark):
    # a doc shorter than n tokens emits ONE whole-doc shingle (the
    # shingles() floor rule) and can still match an identical short
    # train prefix-slice only if the train side produced the same string.
    train = _docs(spark, [(1, "tiny doc")])
    ev = _docs(spark, [(5, "tiny doc")])
    r = ngram_contamination(ev, train, n=8, max_shingle_df=None).collect()[0]
    assert r["total_ngrams"] == 1
    assert r["matched_ngrams"] == 1
    assert r["contamination"] == 1.0


def test_split_contamination_composes_with_dataset_split(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = split_contamination(docs, n=3, max_shingle_df=None)
    rows = out.collect()
    assert len(rows) > 0
    # every reported doc really is in the test split of the same seed
    from approximate_pagerank_public_spark.operators.sampling import dataset_split

    test_ids = {
        r["doc_id"]
        for r in dataset_split(docs).where(F.col("split") == "test").collect()
    }
    assert {r["doc_id"] for r in rows} == test_ids
    for r in rows:
        assert 0 <= r["matched_ngrams"] <= r["total_ngrams"]
        assert r["contamination"] == pytest.approx(
            r["matched_ngrams"] / r["total_ngrams"]
        )


def test_repetition_stats_golden(spark):
    # doc 1: lines -> [ab, ab, cd]; toks(normalized: "ab ab cd") 2-grams:
    #   "ab ab" x1, "ab cd" x1 -> top = "ab ab" (tie -> lexicographic)
    docs = spark.createDataFrame(
        [
            (1, "ab\nab\ncd"),
            (2, "x y x y x y"),  # no dup lines; top 2-gram "x y" x3
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs, dup_n=2).collect()}

    r1 = out[1]
    assert r1["n_lines"] == 3
    assert r1["dup_line_frac"] == pytest.approx(1 - 2 / 3)
    # dup line chars: "ab" occurs twice -> 2*2 chars of 6 total line chars
    assert r1["dup_line_char_frac"] == pytest.approx(4 / 6)
    # normalized text "ab ab cd" (8 chars): top 2-gram "ab ab" (5 chars) x1
    assert r1["top_ngram"] == "ab ab"
    assert r1["top_ngram_frac"] == pytest.approx(5 / 8)
    # 2-gram positions: ["ab ab","ab cd"] -> 2 positions, 2 distinct
    assert r1["dup_ngram_frac"] == 0.0

    r2 = out[2]
    assert r2["n_lines"] == 1
    assert r2["dup_line_frac"] == 0.0
    assert r2["top_ngram"] == "x y"
    # "x y x y x y" = 11 chars; "x y" (3 chars) occurs 3x -> 9/11
    assert r2["top_ngram_frac"] == pytest.approx(9 / 11)
    # 2-gram positions: 5 total ("x y","y x","x y","y x","x y"), 2 distinct
    assert r2["dup_ngram_frac"] == pytest.approx(3 / 5)


def test_repetition_stats_short_doc_no_ngrams(spark):
    docs = spark.createDataFrame([(1, "word")], "doc_id long, text string")
    r = repetition_stats(docs, top_n=2, dup_n=5).collect()[0]
    assert r["top_ngram"] is None
    assert r["top_ngram_frac"] == 0.0
    assert r["dup_ngram_frac"] == 0.0
    assert r["n_lines"] == 1 and r["dup_line_frac"] == 0.0


def test_duplicate_spans_cross_doc_only(spark):
    from approximate_pagerank_public_spark.operators.curation import (
        duplicate_spans,
        window_dedup_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),        # windows(3): abc bcd cde
            (2, "x B C D y"),        # xbc bcd cdy (case-normalized)
            (3, "a b"),              # shorter than the window: no rows
            (4, "p q r p q r"),      # 'p q r' repeats WITHIN one doc only
        ],
        "doc_id long, text string",
    )
    spans = (
        duplicate_spans(docs, window=3)
        .toPandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    # only the cross-doc window 'b c d' is flagged, at pos 2 in both docs
    assert list(spans["doc_id"]) == [1, 2]
    assert list(spans["pos"]) == [2, 2]
    assert spans["window_hash"].nunique() == 1

    stats = (
        window_dedup_stats(docs, window=3)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(stats["doc_id"]) == [1, 2, 4]  # doc 3 has no windows
    assert list(stats["total_windows"]) == [3, 3, 4]
    assert list(stats["dup_windows"]) == [1, 1, 0]
    assert stats["dup_fraction"].tolist() == [1 / 3, 1 / 3, 0.0]


def test_pack_chunks_contiguous_spans(spark):
    """Spans tile the concatenated corpus exactly in doc_id order and
    chunk indices match the div arithmetic."""
    from approximate_pagerank_public_spark.operators.curation import (
        pack_chunks,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c"),            # 3 tokens  -> [0, 3)
            (2, " ".join(["t"] * 7)),  # 7 tokens -> [3, 10)
            (3, "x"),                # 1 token   -> [10, 11)
            (4, " ".join(["u"] * 5)),  # 5 tokens -> [11, 16)
        ],
        "doc_id long, text string",
    )
    out = (
        pack_chunks(docs, chunk_tokens=4)
        .orderBy("doc_id")
        .collect()
    )
    spans = [(r["start_tok"], r["start_tok"] + r["n_tokens"]) for r in out]
    assert spans == [(0, 3), (3, 10), (10, 11), (11, 16)]
    assert [(r["chunk_first"], r["chunk_last"]) for r in out] == [
        (0, 0),   # tokens 0-2   in chunk 0
        (0, 2),   # tokens 3-9   straddle chunks 0-2
        (2, 2),   # token  10    in chunk 2
        (2, 3),   # tokens 11-15 straddle chunks 2-3
    ]


def test_line_dedup_keep_first_global(spark):
    from approximate_pagerank_public_spark.operators.curation import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\ngamma"),
            (2, "beta\ndelta"),
            (3, "gamma\nbeta\nepsilon"),
        ],
        "doc_id long, text string",
    )
    got = {
        int(r.doc_id): (int(r.n_lines), int(r.n_kept), r.clean_text)
        for r in line_dedup(docs).collect()
    }
    # doc 1 is first for alpha/beta/gamma; doc 2 keeps only delta;
    # doc 3 keeps only epsilon
    assert got[1] == (3, 3, "alpha\nbeta\ngamma")
    assert got[2] == (2, 1, "delta")
    assert got[3] == (3, 1, "epsilon")


def test_line_dedup_all_dropped_and_empty(spark):
    from approximate_pagerank_public_spark.operators.curation import line_dedup

    docs = spark.createDataFrame(
        [(1, "x\ny"), (2, "x\ny"), (3, "   ")],
        "doc_id long, text string",
    )
    rows = {int(r.doc_id): r for r in line_dedup(docs).collect()}
    assert rows[2].n_kept == 0 and rows[2].clean_text == ""
    assert rows[1].clean_text == "x\ny"
    assert 3 not in rows  # zero non-empty lines -> no row


def test_line_dedup_chunk_mode_order_preserved(spark):
    from approximate_pagerank_public_spark.operators.curation import line_dedup

    # doc 2's first chunk equals doc 1's first chunk (dropped); its
    # second chunk is unique (kept); reassembly preserves order
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b e f")],
        "doc_id long, text string",
    )
    got = {
        int(r.doc_id): (int(r.n_lines), int(r.n_kept), r.clean_text)
        for r in line_dedup(docs, chunk_tokens=2, join_sep=" ").collect()
    }
    assert got[1] == (2, 2, "a b c d")
    assert got[2] == (2, 1, "e f")


def test_chunk_windows_overlap_and_clamp(spark):
    from approximate_pagerank_public_spark.operators.curation import (
        chunk_windows,
    )

    # 10 tokens, window 4, stride 3 -> starts 0,3,6,9; last two clamp
    docs = _docs(spark, [(1, "a b c d e f g h i j")])
    rows = {
        r["start_tok"]: r
        for r in chunk_windows(docs, window=4, stride=3).collect()
    }
    assert sorted(rows) == [0, 3, 6, 9]
    assert rows[0]["n_tokens"] == 4 and rows[0]["chunk_idx"] == 0
    assert rows[3]["n_tokens"] == 4 and rows[3]["chunk_idx"] == 1
    assert rows[6]["n_tokens"] == 4
    assert rows[9]["n_tokens"] == 1 and rows[9]["chunk_idx"] == 3
    # consecutive chunks share window-stride tokens: chunk fps of the
    # same token content are identical across docs (pure content id)
    docs2 = _docs(spark, [(2, "a b c d e f g h i j")])
    rows2 = {
        r["start_tok"]: r["chunk_fp"]
        for r in chunk_windows(docs2, window=4, stride=3).collect()
    }
    assert all(rows2[s] == rows[s]["chunk_fp"] for s in rows2)


def test_chunk_windows_single_short_doc(spark):
    from approximate_pagerank_public_spark.operators.curation import (
        chunk_windows,
    )

    docs = _docs(spark, [(7, "  Only Two  ")])
    out = chunk_windows(docs, window=64, stride=48).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["chunk_idx"], r["start_tok"], r["n_tokens"]) == (0, 0, 2)
    with pytest.raises(ValueError):
        chunk_windows(docs, window=0, stride=4)


def test_pii_scan_counts_and_redaction_order(spark):
    from approximate_pagerank_public_spark.operators.curation import pii_scan

    docs = _docs(
        spark,
        [
            (
                1,
                "mail a.b+c@ex-ample.org then 10.1.2.3 and "
                "4111111111111111 call +1 (555) 010-1234 done",
            ),
            (2, "no pii here at all"),
        ],
    )
    out = {r["doc_id"]: r for r in pii_scan(docs).collect()}
    r1, r2 = out[1], out[2]
    assert (r1["n_email"], r1["n_ipv4"], r1["n_digit_run"], r1["n_phone"]) == (
        1,
        1,
        1,
        1,
    )
    assert (r2["n_email"], r2["n_ipv4"], r2["n_digit_run"], r2["n_phone"]) == (
        0,
        0,
        0,
        0,
    )
    # email digits are redacted BEFORE the digit-run pass: a doc whose
    # only digits sit inside an email keeps n_digit_run counting the
    # original text, but the redacted text contains <EMAIL>, not <NUM>
    docs3 = _docs(spark, [(3, "x 1234567890123@example.com y")])
    fp3 = pii_scan(docs3).collect()[0]
    from pyspark.sql import functions as F2

    expect = docs3.sparkSession.createDataFrame(
        [("x <EMAIL> y",)], "t string"
    ).select(F2.md5(F2.encode("t", "UTF-8")).alias("fp"))
    assert fp3["redacted_fp"] == expect.collect()[0]["fp"]


def test_max_coverage_greedy_hand_golden(spark):
    from approximate_pagerank_public_spark.operators.curation import (
        max_coverage_docs,
    )
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["a b c d", "a b c", "x y z w v"],
            }
        )
    )
    got = [tuple(map(int, r)) for r in max_coverage_docs(docs, k=5).collect()]
    # doc2 covers 3 shingles, then doc0 adds 2; doc1's only shingle is
    # then covered -> early stop
    assert got == [(1, 2, 3), (2, 0, 2)]
