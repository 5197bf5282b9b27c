"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline primitives, all built-in-function expressions
(whole-stage codegen; no UDFs):

- :func:`token_count` — whitespace tokens + a BPE-ish subword estimate
  (chars/4 heuristic blended with punctuation splits).
- :func:`quality_score` — length / punctuation-ratio / stopword-ratio /
  mean-word-length heuristics in [0, 1].
- :func:`language_id` — character n-gram heuristic over tiny built-in
  profiles (deterministic; a stand-in for fasttext-style LID, which is
  not available in this environment).
- :func:`fingerprint` — polynomial rolling hash of the normalized text
  (document fingerprinting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_STOPWORDS = (
    "the,a,an,and,or,of,to,in,is,it,that,for,on,with,as,was,at,by,be,this,"
    "are,from,have,has,not,but,they,you,we,he,she,his,her,its"
).split(",")

# most-frequent trigrams per language (tiny deterministic profiles)
_LANG_TRIGRAMS = {
    "en": ["the", "and", "ing", "ion", "tio", "ent", "ati"],
    "de": ["der", "die", "und", "ein", "ich", "sch", "che"],
    "fr": ["les", "ent", "des", "que", "ion", "eur", "ait"],
    "es": ["que", "ión", "los", "ado", "con", "ent", "ste"],
}


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, n_ws_tokens, n_subword_est)``."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    # BPE-ish estimate: word pieces ≈ words + ceil(chars/8) overflow pieces
    sub = ws + F.ceil(F.length(t) / 8)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.cast("long").alias("n_ws_tokens"),
        sub.cast("long").alias("n_subword_est"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, len_score, punct_ratio, stopword_ratio, quality)``."""
    t = F.col(text_col)
    length = F.length(t)
    n_punct = length - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    punct_ratio = n_punct / F.greatest(length, F.lit(1))
    toks = F.split(F.lower(t), r"\s+")
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(_STOPWORDS)))
    stopword_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    len_score = F.least(length / F.lit(500.0), F.lit(1.0))
    quality = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * F.least(stopword_ratio * 3, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0)))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        len_score.alias("len_score"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, lang_pred, lang_score)`` — argmax over per-language
    trigram-hit counts (expression-only; ties → lexicographically first)."""
    t = F.lower(F.col(text_col))
    scores = [
        (
            lang,
            sum(
                (F.length(t) - F.length(F.replace(t, F.lit(tri), F.lit("")))) / len(tri)
                for tri in tris
            ),
        )
        for lang, tris in sorted(_LANG_TRIGRAMS.items())
    ]
    pairs = F.array(
        *[F.struct(F.lit(lang).alias("lang"), s.cast("double").alias("s")) for lang, s in scores]
    )
    best = F.array_sort(
        pairs, lambda a, b: F.when(a["s"] > b["s"], -1).when(a["s"] < b["s"], 1).otherwise(0)
    )[0]
    return docs.select(
        F.col(id_col).alias("doc_id"),
        best["lang"].alias("lang_pred"),
        best["s"].alias("lang_score"),
    )


def fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", method: str = "xxhash64"
) -> DataFrame:
    """``(doc_id, fp)`` — content fingerprint of normalized text.

    ``xxhash64`` (default, fastest, bigint) or ``md5`` (hex string,
    portable across engines — used for cross-engine oracle checks)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    fp = F.xxhash64(norm) if method == "xxhash64" else F.md5(F.encode(norm, "UTF-8"))
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fp"))


def vocab_topk(
    docs: DataFrame, k: int = 50, text_col: str = "text"
) -> DataFrame:
    """``(token, n)`` — the k most frequent whitespace tokens across the
    corpus (lowercased), ties broken lexicographically.

    The vocabulary-builder staple of a training-data pipeline: explode +
    hash-aggregate, map-side combinable, shuffle volume = distinct
    tokens (not corpus size). At 100 TB the same plan holds; cap the
    explode's skew with the default shuffle partitioning — no windows,
    no collects."""
    toks = F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
        "token"
    )
    return (
        docs.select(toks)
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


def oov_rate(
    docs: DataFrame,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_tok, n_oov, oov_rate)`` — fraction of a document's
    whitespace tokens outside the corpus top-``k`` vocabulary (ties
    lexicographic; same tokenizer as :func:`vocab_topk`). The classic
    out-of-vocabulary quality signal: high OOV rate flags boilerplate,
    non-target-language, or garbled text.

    Scale shape: the vocabulary is k rows — a **broadcast** join against
    the exploded token stream, so the per-doc aggregate is map-side
    combinable and the only shuffle is the groupBy(doc_id). Documents
    with zero tokens emit no row (no token stream to rate)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("token"),
    ).where(F.col("token") != "")
    vocab = vocab_topk(docs, k=k, text_col=text_col).select(
        "token", F.lit(1).alias("_in")
    )
    j = toks.join(F.broadcast(vocab), "token", "left")
    return (
        j.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tok"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_rate", F.col("n_oov").cast("double") / F.col("n_tok")
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, score_micro, rank)`` — top-``k`` documents by BM25
    relevance to ``query_terms`` (Robertson/Spärck-Jones; the retrieval
    staple the reference's evaluation-era pipelines rank candidates
    with), computed with EXACT integer arithmetic so a DuckDB oracle
    hash-matches.

    Parameters are pinned to the classic k1=1.2, b=0.75 — both exact
    rationals (6/5, 3/4), so with integer corpus scalars N (docs),
    L (total tokens) and per-row integers tf, df, dl, each term's score

        idf · tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl·N/L)

    clears all denominators to the integer form

        num = (2N − 2df + 1) · 22 · tf · L
        den = (2df + 1) · (10·L·tf + 3·L + 9·dl·N)

    (idf is the rational Robertson variant (N−df+0.5)/(df+0.5) — libm
    ``ln`` is not bit-standardized across engines, same declared scope
    as tfidf's linear idf). ONE IEEE division num/den per (doc, term)
    is bit-identical across engines; the per-term scores are truncated
    to integer micro-units (⌊s·10⁶⌋) BEFORE the cross-term sum — the
    same order-independence recipe as the ANF readout — so the doc
    total is an exact integer no summation order can perturb. Ranking
    ties break by ascending doc_id.

    Scale shape: the token stream filters to the query's terms BEFORE
    any shuffle (the filter sits on the explode — at 100 TB the shuffle
    carries only query-term hits), df/N/L are three broadcastable
    scalars-or-tiny aggregates, and the final top-k is one ordered
    limit. int64 products bound: num < 2N·22·tf·L — exact while
    N·tf·L < 2⁵⁹, i.e. any single-machine fixture; at cluster scale the
    division's double rounding is the only (declared) approximation.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("token"),
    ).where(F.col("token") != "")
    # corpus scalars: N docs, L total tokens (exact integers)
    n_docs = docs.count()
    total_len = toks.count()
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    hits = toks.where(F.col("token").isin(terms))
    tf = hits.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n, ell = F.lit(int(n_docs)), F.lit(int(total_len))
    scored = tf.join(F.broadcast(dfreq), "token").join(dl, "doc_id")
    num = (
        (2 * n - 2 * F.col("df") + 1) * F.lit(22) * F.col("tf") * ell
    ).cast("double")
    den = (
        (2 * F.col("df") + 1)
        * (10 * ell * F.col("tf") + 3 * ell + 9 * F.col("dl") * n)
    ).cast("double")
    per_term = scored.withColumn(
        "micro", F.floor(num / den * F.lit(1000000.0)).cast("long")
    )
    totals = per_term.groupBy("doc_id").agg(
        F.sum("micro").cast("long").alias("score_micro")
    )
    topk = totals.orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    ).limit(int(k))
    # rank the k survivors only: TakeOrderedAndProject does the global
    # cut; the single-partition window touches k rows, never the corpus
    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return topk.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select("doc_id", "score_micro", "rank")


def tfidf_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    idf: str = "linear",
) -> DataFrame:
    """``(doc_id, token, tf, score, rank)`` — each document's top-k
    terms by TF-IDF, the keyword-extraction staple.

    ``idf='linear'`` (default) scores ``tf · N / df``: the numerator is
    an exact integer and the single IEEE division is bit-identical
    across engines, so the DuckDB oracle hash-matches (same discipline
    as the link-prediction scores). ``idf='log'`` scores the classic
    ``tf · ln(N / df)`` — engine-side only (libm ``ln`` is not
    bit-standardized across engines; same declared scope as Adamic-Adar).
    Ranking ties break lexicographically by token.

    Scale shape: explode → (doc, token) count (map-side combinable),
    token-keyed df join (df table size = vocabulary, broadcastable),
    per-doc top-k window (never wider than one document's distinct
    tokens). N is one count scalar.
    """
    if idf not in ("linear", "log"):
        raise ValueError(f"unknown idf {idf!r}")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token"),
    ).where(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = docs.count()
    scored = tf.join(dfreq, "token")
    if idf == "linear":
        score = (F.col("tf") * F.lit(int(n_docs))).cast("double") / F.col(
            "df"
        ).cast("double")
    else:
        score = F.col("tf").cast("double") * F.log(
            F.lit(float(n_docs)) / F.col("df").cast("double")
        )
    scored = scored.withColumn("score", score)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(int(k)))
        .select("doc_id", "token", "tf", "score", "rank")
    )
