"""M1: DataFrame-native BM25 top-k must be rank-identical to the NumPy oracle
on the full fixture query set (FIXTURES.md F2/F3) at sf0.001."""

from __future__ import annotations

import numpy as np
import pytest

from audioflux_spark.operators.tokenize import corpus_stats, doc_stats, term_freqs
from audioflux_spark.operators.topk import bm25_topk_exhaustive


@pytest.fixture(scope="module")
def built(spark, transcripts_sdf):
    tf_df = term_freqs(transcripts_sdf).cache()
    ds_df = doc_stats(transcripts_sdf).cache()
    stats = corpus_stats(transcripts_sdf)
    tf_df.count(), ds_df.count()
    return tf_df, ds_df, stats


def assert_rank_identical(got_pdf, want_pdf, context=""):
    assert len(got_pdf) == len(want_pdf), (
        f"{context}: row count {len(got_pdf)} != {len(want_pdf)}"
    )
    if len(want_pdf) == 0:
        return
    g = got_pdf.reset_index(drop=True)
    w = want_pdf.reset_index(drop=True)
    same_doc = (g["conv_id"] == w["conv_id"]) & (g["turn_idx"] == w["turn_idx"])
    assert same_doc.all(), f"{context}: rank order differs:\n{g}\nvs\n{w}"
    assert np.allclose(g["score"], w["score"], rtol=1e-9, atol=1e-12), (
        f"{context}: scores diverge"
    )


def test_corpus_stats_match_oracle(built, oracle):
    _, _, stats = built
    assert stats.n_docs == oracle.N
    assert abs(stats.avgdl - oracle.avgdl) < 1e-9


def test_rank_identity_all_queries(built, oracle, queries):
    tf_df, ds_df, stats = built
    for q in queries:
        got = (
            bm25_topk_exhaustive(tf_df, ds_df, stats, q.query_text, q.k)
            .toPandas()
        )
        want = oracle.topk(q.query_text, q.k)
        assert_rank_identical(got, want, context=f"{q.query_id} '{q.query_text}'")


def test_score_monotone_in_tf(built, oracle):
    """Property (SURVEY §5): for the planted pair, tf=3 doc outranks tf=1."""
    tf_df, ds_df, stats = built
    got = bm25_topk_exhaustive(tf_df, ds_df, stats, "needle_pair_1", 10).toPandas()
    assert len(got) == 2
    assert got["score"].iloc[0] > got["score"].iloc[1]
