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


def test_conjunctive_subset_and_coverage(built, transcripts_sdf):
    """AND semantics: every result doc contains EVERY query term; the
    result equals the exhaustive (OR) ranking restricted to full-match
    docs; an absent term empties the result."""
    import pandas as pd
    from pyspark.sql import functions as F

    from audioflux_spark.operators.topk import bm25_topk_conjunctive

    tf_df, ds_df, stats = built
    got = bm25_topk_conjunctive(tf_df, ds_df, stats, "term00000 term00001", 50).toPandas()
    assert len(got) > 0, "conjunctive query found nothing on the fixture"
    # every hit contains both terms
    docs_both = (
        tf_df.filter(F.col("term").isin(["term00000", "term00001"]))
        .groupBy("conv_id", "turn_idx")
        .count()
        .filter(F.col("count") == 2)
        .toPandas()
    )
    full = set(map(tuple, docs_both[["conv_id", "turn_idx"]].to_numpy()))
    assert set(map(tuple, got[["conv_id", "turn_idx"]].to_numpy())) <= full
    # equals the OR ranking restricted to full-match docs (same k window)
    or_all = bm25_topk_exhaustive(
        tf_df, ds_df, stats, "term00000 term00001", 10**6
    ).toPandas()
    want = or_all[
        or_all[["conv_id", "turn_idx"]].apply(tuple, axis=1).isin(full)
    ].head(50).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_conjunctive_absent_term_is_empty(built):
    from audioflux_spark.operators.topk import bm25_topk_conjunctive

    tf_df, ds_df, stats = built
    got = bm25_topk_conjunctive(
        tf_df, ds_df, stats, "term00000 zzz_never_a_term_zzz", 5
    ).toPandas()
    assert len(got) == 0
