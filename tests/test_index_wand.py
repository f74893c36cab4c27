"""M2-M5: index build, blob integrity, block-max WAND rank-identity,
resume byte-identity (FIXTURES.md F5), per-turn text round-trip."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from audioflux_spark.config import DEFAULT, EngineConfig, IndexConfig
from audioflux_spark.functions.codec import decode_postings, varint_decode
from audioflux_spark.operators.indexer import build_index
from audioflux_spark.operators.wand import bm25_topk_indexed, bm25_topk_many
from audioflux_spark.plans.checkpoint import load_manifest, save_manifest
from audioflux_spark.sources.segments import IndexReader
from tests.test_topk_exhaustive import assert_rank_identical

CFG = EngineConfig(
    index=IndexConfig(block_size=32, hot_term_partials=4, salt_buckets=4, build_partitions=8)
)


@pytest.fixture(scope="module")
def index_dir(spark, transcripts_sdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index") / "idx")
    build_index(spark, transcripts_sdf, d, cfg=CFG)
    return d


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    return IndexReader(spark, index_dir)


def test_meta_matches_oracle(reader, oracle):
    assert reader.meta.n_docs == oracle.N
    assert abs(reader.meta.avgdl - oracle.avgdl) < 1e-9


def test_segment_blobs_match_oracle_postings(reader, oracle):
    """Decode every segment blob for a sample of terms; postings (doc ids in
    (conv_id, turn_idx) order, tf) must equal the oracle's."""
    sample_terms = ["hotterm", "tie", "needle_unique_0", "needle_pair_0"]
    rows = {
        r["term"]: r
        for r in reader.segments.filter(
            reader.segments.term.isin(sample_terms)
        ).collect()
    }
    # doc_id -> position mapping: docstore doc_id is the rank of
    # (conv_id, turn_idx); oracle indexes docs in the same sorted order
    for t in sample_terms:
        assert t in rows, f"term {t} missing from merged segments"
        r = rows[t]
        got_docs = decode_postings(bytes(r["doc_blob"]), int(r["df"]))
        got_tf = varint_decode(bytes(r["tf_blob"]), int(r["df"])).astype(np.int64)
        want_docs, want_tf = oracle.postings[t]
        np.testing.assert_array_equal(got_docs, want_docs)
        np.testing.assert_array_equal(got_tf, want_tf.astype(np.int64))
        # dl blob matches oracle doc lengths
        got_dl = varint_decode(bytes(r["dl_blob"]), int(r["df"])).astype(np.int64)
        np.testing.assert_array_equal(got_dl, oracle.doc_len[want_docs].astype(np.int64))


def test_hot_term_was_merged_from_many_partials(reader, index_dir, spark):
    partials = spark.read.parquet(os.path.join(index_dir, "segments_partial"))
    n = partials.filter(partials.term == "hotterm").count()
    assert n == CFG.index.build_partitions  # present in every partition
    merged = reader.segments.filter(reader.segments.term == "hotterm").count()
    assert merged == 1


def test_wand_rank_identity_all_queries(reader, oracle, queries):
    for q in queries:
        got = bm25_topk_indexed(reader, q.query_text, q.k).toPandas()
        want = oracle.topk(q.query_text, q.k)
        assert_rank_identical(got, want, context=f"{q.query_id} '{q.query_text}'")


def test_wand_equals_exhaustive_random_queries(reader, oracle):
    """Property (SURVEY §5/M4): WAND pruning == exhaustive scoring, random
    multi-term queries drawn from the corpus vocabulary."""
    rng = np.random.default_rng(123)
    vocab = sorted(oracle.postings.keys())
    for trial in range(10):
        n_terms = int(rng.integers(1, 5))
        terms = [vocab[i] for i in rng.integers(0, len(vocab), n_terms)]
        qtext = " ".join(terms)
        k = int(rng.choice([3, 10, 50]))
        got = bm25_topk_indexed(reader, qtext, k).toPandas()
        want = oracle.topk(qtext, k)
        assert_rank_identical(got, want, context=f"random '{qtext}' k={k}")


def test_batch_query_path(reader, oracle, queries):
    batch = [(q.query_id, q.query_text, q.k) for q in queries[:8]]
    res = bm25_topk_many(reader, batch).toPandas()
    for qid, text, k in batch:
        got = (
            res[res.query_id == qid]
            .sort_values("rank")[["conv_id", "turn_idx", "score"]]
            .reset_index(drop=True)
        )
        want = oracle.topk(text, k)
        assert_rank_identical(got, want, context=f"batch {qid}")


def test_per_turn_text_roundtrip(reader, transcripts_pdf):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering after index → docstore round-trip."""
    got = (
        reader.docstore.select("doc_id", "conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        transcripts_pdf[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert (got["doc_id"].to_numpy() == np.arange(len(want))).all()
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]], want
    )


def test_manifest_lineage(index_dir):
    m = load_manifest(index_dir)
    assert len(m.entries) == CFG.index.build_partitions
    for e in m.entries.values():
        assert e.status == "done"
        assert e.postings > 0 and e.bytes > 0 and e.terms > 0
        assert e.input_fingerprint
        assert 0 < e.skew_ratio < 10


def test_resume_byte_identical(spark, transcripts_sdf, index_dir, tmp_path_factory):
    """F5: truncate the manifest + delete half the partial partitions; the
    resumed build must only rebuild those and produce blob-identical merged
    segments."""
    d2 = str(tmp_path_factory.mktemp("index_resume") / "idx")
    shutil.copytree(index_dir, d2)
    m = load_manifest(d2)
    killed = sorted(m.entries)[: len(m.entries) // 2]
    for pid in killed:
        del m.entries[pid]
        shutil.rmtree(os.path.join(d2, "segments_partial", f"seg_id={pid}"))
        shutil.rmtree(os.path.join(d2, "docstore", f"seg_id={pid}"))
    save_manifest(d2, m)

    build_index(spark, transcripts_sdf, d2, cfg=CFG, resume=True)

    def segset(d):
        rows = (
            spark.read.parquet(os.path.join(d, "segments"))
            .select("term", "df", "doc_blob", "tf_blob", "dl_blob")
            .collect()
        )
        return {
            r["term"]: (r["df"], bytes(r["doc_blob"]), bytes(r["tf_blob"]), bytes(r["dl_blob"]))
            for r in rows
        }

    assert segset(d2) == segset(index_dir)
    m2 = load_manifest(d2)
    assert len(m2.entries) == CFG.index.build_partitions
