"""Incremental index maintenance — the engine's streaming surface.

The reference's only streaming construct is the isContinue tail-carry
(/root/reference/src/stft_algorithm.c:41,50-51,536-586; Python splice
/root/reference/python/audioflux/feature/extractor.py:228-254): new chunks
are processed against bounded carried state and results are identical to a
one-shot run. The distributed restatement: each new transcript snapshot
becomes an index *generation* — a complete mini-index built by the normal
(resumable) build path — and the query layer sums stats across generations,
so scores equal a from-scratch rebuild exactly (verified by
tests/test_incremental.py rank-identity vs the oracle on the full corpus).

Also provides a Structured Streaming sink: foreachBatch → add_generation,
turning a stream of transcript files into a continuously-updated index.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from audioflux_spark.config import DEFAULT, EngineConfig
from audioflux_spark.operators.indexer import build_index
from audioflux_spark.sources.segments import GENERATIONS_SUBDIR, IndexReader


def next_generation_dir(index_dir: str) -> str:
    root = os.path.join(index_dir, GENERATIONS_SUBDIR)
    os.makedirs(root, exist_ok=True)
    existing = [int(n[4:]) for n in os.listdir(root) if n.startswith("gen-")]
    nxt = (max(existing) + 1) if existing else 1
    return os.path.join(root, f"gen-{nxt:05d}")


def add_generation(
    spark: SparkSession,
    new_transcripts: DataFrame,
    index_dir: str,
    cfg: EngineConfig = DEFAULT,
) -> IndexReader:
    """Index ONLY the new snapshot (old generations untouched); returns a
    fresh reader over all generations."""
    gen_dir = next_generation_dir(index_dir)
    build_index(spark, new_transcripts, gen_dir, cfg=cfg, resume=True)
    return IndexReader(spark, index_dir)


def streaming_index_sink(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    cfg: EngineConfig = DEFAULT,
    trigger_available_now: bool = True,
):
    """Structured Streaming: watch a directory of transcript parquet files;
    each micro-batch becomes an index generation. Spark's streaming
    checkpoint gives exactly-once file accounting; the per-generation build
    manifest gives intra-batch resumability."""
    from audioflux_spark.sources.transcripts import TRANSCRIPTS_SCHEMA

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(source_dir)
    )

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        add_generation(spark, batch_df, index_dir, cfg=cfg)

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
