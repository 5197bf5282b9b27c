from approximate_pagerank_public_spark.sources.transcripts import (
    synthesize_transcripts,
    transcripts_from_events,
    TRANSCRIPTS_FROM_EVENTS_TEMPLATE,
)
from approximate_pagerank_public_spark.sources.readers import load_table, load_tables

__all__ = [
    "synthesize_transcripts",
    "transcripts_from_events",
    "TRANSCRIPTS_FROM_EVENTS_TEMPLATE",
    "load_table",
    "load_tables",
]
