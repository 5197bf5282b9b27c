"""Byte-pair-encoding vocabulary induction over the document corpus.

Learns the first ``n_merges`` BPE merge rules (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016)
the way every tokenizer-training pipeline does: start from characters,
repeatedly merge the globally most frequent adjacent symbol pair. The
reference repo has no tokenizer training; this is part of the
LLM-training-data operator family layered on the same engine (companion
to ``textstats``/``curation``).

Determinism contract (the DuckDB oracle replays every step verbatim):

- words = ``split(lower(trim(text)), '\\s+')`` filtered to
  ``^[a-z0-9]+$`` (pipe-free by construction, so the delimited symbol
  encoding below is unambiguous), weighted by corpus frequency;
- a word's symbol state is the string ``|s1||s2||...||sn|`` (every
  symbol wrapped in single pipes, so adjacent symbols share a ``||``
  delimiter) built by one global ``regexp_replace(w, '(.)', '|$1|')``;
- pair counts are exact integers; the merge picked each round is the
  (count desc, left asc, right asc) argmax — total order, no RNG;
- applying a merge is ONE literal string replace of ``|l||r|`` with
  ``|lr|`` — both engines scan left-to-right non-overlapping, which IS
  greedy BPE merge semantics (``|a||a||a|`` -> ``|aa||a|``), and the
  doubled delimiter makes a false cross-symbol match impossible
  (symbols never contain ``|``, so every ``|l||r|`` occurrence aligns
  with a real symbol boundary).

Scale shape — this is the classic vocab-sized trick: rounds iterate
over the DISTINCT-WORD table (corpus-frequency weighted), never the
corpus. Each round is one map-side-combinable pair-count aggregation
over O(vocab) rows plus a 1-row driver argmax and a pure-projection
replace; at 100 TB the corpus is scanned exactly once (the word count),
and every subsequent round touches only the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_RE = "^[a-z0-9]+$"


def _word_table(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(w, cnt, s)`` — distinct alphanumeric words with corpus counts
    and the initial per-character delimited symbol string."""
    toks = F.explode(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ).alias("w")
    return (
        docs.select(toks)
        .where(F.col("w").rlike(WORD_RE))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .withColumn("s", F.regexp_replace(F.col("w"), "(.)", "|$1|"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """``(l, r, total)`` adjacent-symbol pair frequencies, weighted by
    word count — one map-side-combinable aggregation over vocab rows."""
    sy = F.split(F.expr("substring(s, 2, length(s) - 2)"), r"\|\|")
    pairs = words.select(
        F.col("cnt"),
        F.explode(
            F.zip_with(
                F.slice(sy, 1, F.greatest(F.size(sy) - 1, F.lit(0))),
                F.slice(sy, 2, F.greatest(F.size(sy) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
        F.sum("cnt").alias("total")
    )


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` merge rules; returns ``(round, left_sym,
    right_sym, freq)`` in merge order (round starts at 1). Stops early
    if the vocabulary runs out of adjacent pairs.

    The per-round driver step is ONE collected row (the argmax pair) —
    the same bounded-driver-state pattern as the IVF/PQ centroid
    training; everything else is distributed.
    """
    spark = docs.sparkSession
    words = _word_table(docs, id_col, text_col).cache()
    words.count()  # materialize once; rounds rewrite only `s`
    out: list[tuple[int, str, str, int]] = []
    try:
        for rnd in range(1, n_merges + 1):
            best = (
                _pair_counts(words)
                .orderBy(
                    F.col("total").desc(), F.col("l").asc(), F.col("r").asc()
                )
                .limit(1)
                .collect()
            )
            if not best:
                break
            l, r, total = best[0]["l"], best[0]["r"], int(best[0]["total"])
            out.append((rnd, l, r, total))
            pat, rep = f"|{l}||{r}|", f"|{l}{r}|"
            nxt = words.withColumn(
                "s", F.replace(F.col("s"), F.lit(pat), F.lit(rep))
            ).cache()
            nxt.count()
            words.unpersist()
            words = nxt
    finally:
        words.unpersist()
    return spark.createDataFrame(
        out, "round INT, left_sym STRING, right_sym STRING, freq BIGINT"
    )


def bpe_segment(
    docs: DataFrame,
    n_merges: int = 6,
    top_words: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply the learned merges to the vocabulary: the ``top_words``
    most frequent words (count desc, word asc) with their piece
    segmentation after ``n_merges`` rounds — ``(w, cnt, pieces,
    n_pieces)`` where ``pieces`` is the space-joined subword sequence.

    Encoding at corpus scale is the same chain of ``n_merges`` literal
    string replaces — a pure whole-stage-codegen projection applied to
    the vocab (or, streamed, to raw text) with no shuffle beyond the
    word count itself.
    """
    merges = bpe_merges(docs, n_merges, id_col, text_col).collect()
    words = _word_table(docs, id_col, text_col)
    s = F.col("s")
    for m in merges:
        s = F.replace(
            s,
            F.lit(f"|{m['left_sym']}||{m['right_sym']}|"),
            F.lit(f"|{m['left_sym']}{m['right_sym']}|"),
        )
    seg = F.array_join(
        F.split(F.expr("substring(seg_s, 2, length(seg_s) - 2)"), r"\|\|"), " "
    )
    return (
        words.withColumn("seg_s", s)
        .withColumn("pieces", seg)
        .withColumn("n_pieces", F.size(F.split(F.col("pieces"), " ")))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(top_words)
        .select("w", "cnt", "pieces", "n_pieces")
    )
