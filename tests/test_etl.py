"""Transcript ETL: DuckDB oracle parity + input-hint invariants."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from approximate_pagerank_public_spark.operators.etl import (
    EDGES_SQL_TEMPLATE,
    build_edge_table,
    derive_entity_edges,
)
from approximate_pagerank_public_spark.sources.transcripts import (
    transcripts_from_events,
    transcripts_from_events_sql,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    return con


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf.sort_values(list(pdf.columns))
        .reset_index(drop=True)
        .astype({c: "string" for c, t in pdf.dtypes.items() if t == object})
    )


def test_transcripts_from_events_matches_duckdb(spark, events, duck):
    spark_pdf = (
        transcripts_from_events(events).drop("ts").toPandas()
    )
    duck_pdf = duck.sql(
        f"SELECT conv_id, turn_idx, role, text, tool FROM ({transcripts_from_events_sql('duckdb')})"
    ).df()
    a, b = _norm(spark_pdf), _norm(duck_pdf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_stable_turn_ordering(spark, events):
    """turn_idx contiguous & unique per conv_id, consistent with ts."""
    t = transcripts_from_events(events).toPandas()
    for conv, grp in t.groupby("conv_id"):
        grp = grp.sort_values("turn_idx")
        assert list(grp["turn_idx"]) == list(range(len(grp)))
        assert grp["ts"].is_monotonic_increasing


def test_per_turn_text_equality_roundtrip(spark, transcripts_t1, tmp_path):
    """input_hint invariant: per-turn text is preserved exactly under
    stable turn ordering through a write/read cycle."""
    path = str(tmp_path / "t1.parquet")
    transcripts_t1.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    a = transcripts_t1.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = back.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (a["text"] == b["text"]).all()
    assert len(a) == len(b)


def test_edge_table_matches_duckdb(spark, events, duck):
    transcripts = transcripts_from_events(events)
    _, edges = build_edge_table(transcripts)
    spark_pdf = edges.toPandas()
    sql = EDGES_SQL_TEMPLATE.format(SRC=f"({transcripts_from_events_sql('duckdb')})")
    duck_pdf = duck.sql(sql).df()
    a = _norm(spark_pdf)
    b = _norm(duck_pdf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_edge_table_invariants(spark, transcripts_t1):
    vertices, edges = build_edge_table(transcripts_t1)
    vp = vertices.toPandas()
    ep = edges.toPandas()
    n = len(vp)
    # dense ids 0..N-1
    assert sorted(vp["id"]) == list(range(n))
    # no self loops, no duplicates
    assert (ep["src"] != ep["dst"]).all()
    assert not ep.duplicated(["src", "dst"]).any()
    # weights are exact 1/outdeg
    deg = ep.groupby("src").size()
    expected = 1.0 / ep["src"].map(deg)
    assert np.allclose(ep["weight"], expected)


def test_etl_shuffle_join_regime_matches_broadcast_regime(
    spark, transcripts_t1, monkeypatch
):
    """The two ETL regimes (broadcast dictionary joins + fused layout vs
    the beyond-threshold shuffle-join/window fallback) must produce the
    identical edge table — forced by dropping the threshold to 0."""
    from approximate_pagerank_public_spark.operators import etl

    vertices_a, edges_a = build_edge_table(transcripts_t1)
    monkeypatch.setattr(etl, "ETL_BROADCAST_MAX_VERTICES", 0)
    vertices_b, edges_b = build_edge_table(transcripts_t1)
    a = _norm(edges_a.toPandas())
    b = _norm(edges_b.toPandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    pd.testing.assert_frame_equal(
        _norm(vertices_a.toPandas()), _norm(vertices_b.toPandas()), check_dtype=False
    )


def test_synthesized_transcripts_deterministic(spark):
    from approximate_pagerank_public_spark.sources.transcripts import (
        synthesize_transcripts,
    )

    a = synthesize_transcripts(spark, n_convs=50, seed=7, partitions=2).toPandas()
    b = synthesize_transcripts(spark, n_convs=50, seed=7, partitions=5).toPandas()
    a = a.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = b.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # role/tool hub skew present: tool_0 dominates
    tools = a[a["role"] == "tool"]["tool"].value_counts()
    assert tools.index[0] == "tool_0"
