"""M0 tests: fixture determinism + planted-marker ("pure tone") invariants
against the NumPy oracle (FIXTURES.md F1-F3)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from audioflux_spark.fixtures import (
    TIE_BLOCK_SIZE,
    TIE_TEXT,
    gen_queries,
    gen_transcripts,
)
from audioflux_spark.functions.analyzer import tokenize_series
from audioflux_spark.oracle import BM25Oracle


def test_generation_deterministic(transcripts_pdf):
    again = gen_transcripts(500)
    pd.testing.assert_frame_equal(transcripts_pdf, again)


def test_schema_and_pk(transcripts_pdf):
    assert list(transcripts_pdf.columns) == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    assert transcripts_pdf["turn_idx"].dtype == np.int32
    assert not transcripts_pdf.duplicated(["conv_id", "turn_idx"]).any()
    # tool is set exactly when role == 'tool'
    assert (
        (transcripts_pdf["role"] == "tool")
        == transcripts_pdf["tool"].notna()
    ).all()


def test_planted_markers(transcripts_pdf):
    texts = transcripts_pdf["text"]
    assert (texts == TIE_TEXT).sum() == TIE_BLOCK_SIZE
    toks = tokenize_series(texts)
    flat = pd.Series([t for row in toks for t in row])
    counts = flat.value_counts()
    assert counts["needle_unique_0"] == 1
    assert counts["needle_pair_0"] == 4  # tf 3 + tf 1
    hot_docs = sum(1 for row in toks if "hotterm" in row)
    assert 0.3 < hot_docs / len(toks) < 0.5


def test_oracle_needle_rank1(transcripts_pdf, oracle):
    top = oracle.topk("needle_unique_0", k=10)
    assert len(top) == 1
    row = top.iloc[0]
    match = transcripts_pdf[
        (transcripts_pdf.conv_id == row["conv_id"])
        & (transcripts_pdf.turn_idx == row["turn_idx"])
    ]
    assert "needle_unique_0" in match["text"].iloc[0]


def test_oracle_pair_tf_ordering(oracle, transcripts_pdf):
    top = oracle.topk("needle_pair_0", k=10)
    assert len(top) == 2
    # tf=3 doc scores strictly above tf=1 doc (same idf; tf_norm monotone in tf
    # unless doc lengths differ wildly — verify via actual tf)
    toks0 = tokenize_series(
        transcripts_pdf.merge(
            top.iloc[[0]][["conv_id", "turn_idx"]], on=["conv_id", "turn_idx"]
        )["text"]
    ).iloc[0]
    assert toks0.count("needle_pair_0") == 3


def test_oracle_tie_break_order(oracle, transcripts_pdf):
    top = oracle.topk("tie", k=100)
    tie_rows = (
        transcripts_pdf[transcripts_pdf.text == TIE_TEXT][["conv_id", "turn_idx"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(top) == TIE_BLOCK_SIZE
    assert np.allclose(top["score"], top["score"].iloc[0])
    pd.testing.assert_frame_equal(
        top[["conv_id", "turn_idx"]].reset_index(drop=True), tie_rows
    )


def test_oracle_absent_terms(oracle):
    assert len(oracle.topk("zzqx_absent_term zzqx_also_absent", k=10)) == 0
    # partially absent: behaves as the remaining term alone
    a = oracle.topk("needle_unique_1 zzqx_absent_term", k=5)
    b = oracle.topk("needle_unique_1", k=5)
    pd.testing.assert_frame_equal(a, b)


def test_query_set_shape(queries):
    assert len(queries) >= 20
    ids = [q.query_id for q in queries]
    assert len(set(ids)) == len(ids)
    ks = {q.k for q in queries}
    assert {1, 10, 100} <= ks
