"""BPE vocabulary induction vs a pure-Python greedy replay."""

import re
from collections import Counter

import pytest

from approximate_pagerank_public_spark.operators.bpe import (
    bpe_merges,
    bpe_segment,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def _python_bpe(texts, n_merges):
    # the operator's exact recipe: lowercase, \s+ split, [a-z0-9]+ only,
    # weighted pair counts, (count desc, l asc, r asc) argmax, greedy
    # left-to-right merge within each word
    vocab = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower().strip()):
            if re.fullmatch(r"[a-z0-9]+", w):
                vocab[w] += 1
    words = {w: list(w) for w in vocab}
    merges = []
    for rnd in range(1, n_merges + 1):
        pairs = Counter()
        for w, sy in words.items():
            for a, b in zip(sy, sy[1:]):
                pairs[(a, b)] += vocab[w]
        if not pairs:
            break
        (l, r), total = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd, l, r, total))
        for w, sy in words.items():
            out, i = [], 0
            while i < len(sy):
                if i + 1 < len(sy) and sy[i] == l and sy[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sy[i])
                    i += 1
            words[w] = out
    return merges, words, vocab


def test_bpe_merges_match_python_replay(spark, docs):
    n = 6
    got = [
        (row["round"], row["left_sym"], row["right_sym"], row["freq"])
        for row in bpe_merges(docs, n_merges=n).orderBy("round").collect()
    ]
    texts = [r["text"] for r in docs.select("text").collect()]
    want, _, _ = _python_bpe(texts, n)
    assert got == want


def test_bpe_segment_matches_replay_and_reassembles(spark, docs):
    n, k = 6, 20
    got = bpe_segment(docs, n_merges=n, top_words=k).collect()
    texts = [r["text"] for r in docs.select("text").collect()]
    _, words, vocab = _python_bpe(texts, n)
    top = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert [(r["w"], r["cnt"]) for r in got] == top
    for r in got:
        # pieces must replay exactly and concatenate back to the word
        assert r["pieces"].split(" ") == words[r["w"]]
        assert "".join(r["pieces"].split(" ")) == r["w"]
        assert r["n_pieces"] == len(words[r["w"]])
