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
from audioflux_spark.functions.codec import delta_decode_segmented, varint_decode
from audioflux_spark.operators.indexer import build_index
from audioflux_spark.operators.wand import bm25_topk_indexed, bm25_topk_many
from audioflux_spark.plans.checkpoint import load_manifest, save_manifest
from audioflux_spark.sources.segments import IndexReader
from tests.test_topk_exhaustive import assert_rank_identical

# hot_term_partials=1, salt_buckets=2 forces the TWO-PHASE salted merge even
# at 8 build partitions (threshold 1*2 < 8); the incremental tests cover the
# single-phase path
CFG = EngineConfig(
    index=IndexConfig(block_size=32, hot_term_partials=1, salt_buckets=2, build_partitions=8)
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
    """Decode every segment blob for a sample of terms; the posting SET
    (doc keys, tf, dl) must equal the oracle's. Engine docIDs are
    hash-partition-relative, so compare through the docstore key mapping."""
    sample_terms = ["hotterm", "tie", "needle_unique_0", "needle_pair_0"]
    rows = {
        r["term"]: r
        for r in reader.segments.filter(
            reader.segments.term.isin(sample_terms)
        ).collect()
    }
    ds = reader.docstore.select("doc_id", "conv_id", "turn_idx").toPandas()
    # oracle index of each engine doc_id: oracle docs are key-rank ordered
    key_to_oracle = {
        (c, t): i for i, (c, t) in enumerate(zip(oracle.conv_id, oracle.turn_idx))
    }
    docid_to_oracle = np.full(len(ds), -1, dtype=np.int64)
    for did, c, t in zip(ds["doc_id"], ds["conv_id"], ds["turn_idx"]):
        docid_to_oracle[did] = key_to_oracle[(c, t)]
    assert (docid_to_oracle >= 0).all()  # docIDs are a 0..N-1 permutation

    for t in sample_terms:
        assert t in rows, f"term {t} missing from merged segments"
        r = rows[t]
        n = int(r["df"])
        gaps = varint_decode(bytes(r["doc_blob"]), n).astype(np.int64)
        got_docs = delta_decode_segmented(gaps, np.asarray(r["part_counts"]))
        got_tf = varint_decode(bytes(r["tf_blob"]), n).astype(np.int64)
        got_dl = varint_decode(bytes(r["dl_blob"]), n).astype(np.int64)
        got_oracle_ix = docid_to_oracle[got_docs]
        order = np.argsort(got_oracle_ix)
        want_docs, want_tf = oracle.postings[t]
        np.testing.assert_array_equal(got_oracle_ix[order], want_docs)
        np.testing.assert_array_equal(got_tf[order], want_tf.astype(np.int64))
        np.testing.assert_array_equal(
            got_dl[order], oracle.doc_len[want_docs].astype(np.int64)
        )


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
        reader.docstore.select("doc_id", "seg_id", "conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        transcripts_pdf[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # per-turn text equality under the stable key order
    pd.testing.assert_frame_equal(got[["conv_id", "turn_idx", "text"]], want)
    # docIDs are a dense permutation, key-ordered within each partition
    ids = np.sort(got["doc_id"].to_numpy())
    assert (ids == np.arange(len(want))).all()
    for _seg, grp in got.groupby("seg_id"):
        d = grp.sort_values(["conv_id", "turn_idx"])["doc_id"].to_numpy()
        assert (np.diff(d) == 1).all(), "doc_id not key-contiguous within partition"


def test_manifest_lineage(index_dir):
    m = load_manifest(index_dir)
    assert len(m.entries) == CFG.index.build_partitions
    for e in m.entries.values():
        assert e.status == "done"
        assert e.postings > 0 and e.bytes > 0 and e.terms > 0
        assert e.input_fingerprint
        assert 0 < e.skew_ratio < 10


def test_index_inspect_cli(index_dir):
    """The observability CLI surfaces the manifest + meta faithfully: totals
    equal the manifest sums, every partition row carries the lineage fields,
    and a complete index reports no incomplete partitions."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "index_inspect_cli",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "index_inspect_cli.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.inspect(index_dir)
    m = load_manifest(index_dir)
    assert out["n_partitions_built"] == len(m.entries)
    assert out["incomplete_partitions"] == []
    assert out["totals"]["postings"] == sum(e.postings for e in m.entries.values())
    assert out["totals"]["bytes"] == sum(e.bytes for e in m.entries.values())
    assert out["meta"]["n_partitions"] == CFG.index.build_partitions
    assert out["meta"]["n_docs"] > 0 and out["meta"]["avgdl"] > 0
    offs = [p["doc_offset"] for p in out["partitions"]]
    assert offs == sorted(offs) and offs[0] == 0


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
    kept = [p for p in sorted(load_manifest(index_dir).entries) if p not in killed]
    mtimes_before = {
        p: os.path.getmtime(os.path.join(d2, "segments_partial", f"seg_id={p}"))
        for p in kept
    }

    build_index(spark, transcripts_sdf, d2, cfg=CFG, resume=True)

    # kept partitions must NOT have been rewritten (true resume, not rebuild)
    for p in kept:
        assert (
            os.path.getmtime(os.path.join(d2, "segments_partial", f"seg_id={p}"))
            == mtimes_before[p]
        ), f"partition {p} was rebuilt despite valid checkpoint"

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
