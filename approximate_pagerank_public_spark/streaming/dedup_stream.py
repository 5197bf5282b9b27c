"""Streaming exact dedup: ingest-time duplicate flagging with
cross-micro-batch state.

The batch operator (``operators/dedup.py::exact_duplicates``) needs the
whole corpus; at ingest time a 100-TB pipeline instead wants every
arriving document tagged against everything seen SO FAR. The content
key is the SAME Spark-side expression as the batch operator
(``xxhash64`` of whitespace-normalized lowercased text — computed in
the JVM, never in Python), and the per-key state via
``applyInPandasWithState`` is just the canonical (first-seen) doc id,
so state size is one long per distinct content — the minimum any
exact-dedup can carry.

Semantics: within a micro-batch the smallest doc_id of a new content
key becomes canonical; later arrivals of the same key (same batch or
any later batch) are flagged ``is_duplicate`` with ``canonical_id``
pointing at the keeper. Replayed rows re-emit deterministically
(canonical rows stay non-duplicates), so the operator is idempotent
under at-least-once delivery. When micro-batches arrive in doc_id
order the cumulative duplicate set equals the batch
``exact_duplicates`` output exactly (parity-tested).

Scale shape: one shuffle on the content hash per micro-batch (the same
exchange the batch groupBy pays), state one row per distinct content,
pandas work vectorized per group. No driver-side state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from approximate_pagerank_public_spark.operators.dedup import _normalized_text

_OUT_SCHEMA = (
    "doc_id long, content_hash long, canonical_id long, is_duplicate boolean"
)
_STATE_SCHEMA = "canonical long"


def stateful_exact_dedup(
    docs_stream: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, content_hash, canonical_id, is_duplicate)`` per
    arriving document (see module docstring for the semantics)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = docs_stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.xxhash64(_normalized_text(text_col)).alias("content_hash"),
    )
    return keyed.groupBy("content_hash").applyInPandasWithState(
        _dedup_group,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def _dedup_group(key, pdf_iter, state):
    """One content-hash group within one micro-batch. The group is
    materialized (chunk order is not guaranteed) and sorted by doc_id
    so the canonical pick is deterministic; memory is bounded by one
    content key's rows within one micro-batch."""
    import pandas as pd

    content_hash = key[0]
    chunks = list(pdf_iter)
    pdf = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
    if not len(pdf):
        return
    ids = pdf["doc_id"].sort_values().reset_index(drop=True)
    canonical = int(state.get[0]) if state.exists else int(ids.iloc[0])
    state.update((canonical,))
    yield pd.DataFrame(
        {
            "doc_id": ids,
            "content_hash": content_hash,
            "canonical_id": canonical,
            "is_duplicate": ids.ne(canonical),
        }
    )
