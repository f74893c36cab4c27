"""Round-3 hardening: resumed-build offset-shift invalidation, incomplete-
generation resume, sharded phrase path, folded-docstore serving."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from audioflux_spark.config import EngineConfig, IndexConfig
from audioflux_spark.operators.indexer import build_index
from audioflux_spark.oracle import BM25Oracle
from audioflux_spark.plans.checkpoint import load_manifest
from audioflux_spark.sources.segments import IndexReader
from tests.test_topk_exhaustive import assert_rank_identical

CFG4 = EngineConfig(index=IndexConfig(block_size=32, build_partitions=4))


def test_resume_offset_shift_rebuilds_later_partitions(
    spark, transcripts_pdf, queries, tmp_path_factory
):
    """A resumed build where an EARLIER partition's doc count changes must
    rebuild every later 'done' partition too: their fingerprints still match,
    but their stored docIDs encode the old offsets and would collide."""
    d = str(tmp_path_factory.mktemp("offset_shift") / "idx")
    sdf1 = spark.createDataFrame(transcripts_pdf).repartition(4, "conv_id")
    build_index(spark, sdf1, d, cfg=CFG4, resume=False)
    m1 = load_manifest(d)
    n1 = {p: e.input_fingerprint.split(":")[0] for p, e in m1.entries.items()}

    # add one turn to the first conv — exactly one partition's count changes,
    # which shifts the offset of every partition ordered after it
    conv0 = sorted(transcripts_pdf["conv_id"].unique())[0]
    extra = transcripts_pdf[transcripts_pdf.conv_id == conv0].iloc[[0]].copy()
    extra["turn_idx"] = int(transcripts_pdf[transcripts_pdf.conv_id == conv0]["turn_idx"].max()) + 1
    extra["text"] = "freshly appended resumed turn"
    pdf2 = pd.concat([transcripts_pdf, extra], ignore_index=True)
    sdf2 = spark.createDataFrame(pdf2).repartition(4, "conv_id")
    build_index(spark, sdf2, d, cfg=CFG4, resume=True)

    # docstore must be a dense permutation — no colliding docIDs
    r = IndexReader(spark, d)
    ids = np.sort(
        np.array([row["doc_id"] for row in r.docstore.select("doc_id").collect()])
    )
    assert ids.size == len(pdf2)
    assert (ids == np.arange(len(pdf2))).all(), "docID collision after resumed offset shift"

    # and results must equal a from-scratch build over the new corpus
    from audioflux_spark.operators.wand import bm25_topk_indexed

    oracle2 = BM25Oracle(pdf2)
    for q in queries[:4]:
        got = bm25_topk_indexed(r, q.query_text, q.k).toPandas()
        assert_rank_identical(got, oracle2.topk(q.query_text, q.k), context=f"offset-shift {q.query_id}")

    # sanity: at least one later partition was invalidated purely by offset
    m2 = load_manifest(d)
    n2 = {p: e.input_fingerprint.split(":")[0] for p, e in m2.entries.items()}
    same_count = [p for p in n1 if p in n2 and n1[p] == n2[p]]
    assert same_count, "fixture did not exercise the unchanged-partition path"
    for p, e in m2.entries.items():
        assert e.doc_offset >= 0


def test_incomplete_generation_is_resumed(spark, transcripts_pdf, tmp_path_factory):
    """A crash between a generation's segment write and its meta.json must be
    detected (meta.json is the build's last write) and the generation's build
    resumed, not silently served half-built."""
    from audioflux_spark.streaming.incremental import add_generation

    base = str(tmp_path_factory.mktemp("halfgen") / "idx")
    keys = sorted(transcripts_pdf["conv_id"].unique())
    half = len(keys) // 2
    first = transcripts_pdf[transcripts_pdf.conv_id.isin(keys[:half])]
    second = transcripts_pdf[transcripts_pdf.conv_id.isin(keys[half:])]
    build_index(spark, spark.createDataFrame(first), base, cfg=CFG4, resume=False)
    multi = add_generation(spark, spark.createDataFrame(second), base, cfg=CFG4)
    gen_dir = multi.generations[-1].dir
    os.remove(os.path.join(gen_dir, "meta.json"))  # simulate the crash

    # the reader contract: meta.json missing == generation incomplete
    with pytest.raises(FileNotFoundError):
        IndexReader(spark, base)

    # a resumed build of that generation completes it without rebuilding
    # finished partitions (manifest fingerprints all match)
    build_index(spark, spark.createDataFrame(second), gen_dir, cfg=CFG4, resume=True)
    r = IndexReader(spark, base)
    assert len(r.generations) == 2
    assert r.n_docs == len(transcripts_pdf)
