"""Streaming ingest dedup: the kept key set must equal batch dropDuplicates
over the concatenated input, for any micro-batch chunking, with duplicates
planted both WITHIN and ACROSS chunks (the case per-batch dedup gets wrong)."""

from __future__ import annotations

import time

import pandas as pd

from audioflux_spark.streaming.dedup import dedup_batch, dedup_stream, with_content_key


def _mk_docs() -> pd.DataFrame:
    texts = [f"doc body {i % 40}" for i in range(160)]  # every text seen 4x
    return pd.DataFrame(
        {
            "doc_id": range(160),
            "text": texts,
            "ts": pd.to_datetime(
                [1_700_000_000 + 60 * i for i in range(160)], unit="s"
            ).astype("datetime64[us]"),
        }
    )


def test_stream_dedup_equals_batch(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("dstream_src")
    ck = str(tmp_path_factory.mktemp("dstream_ck"))
    pdf = _mk_docs()
    # 5 chunks: each 40-doc id range repeats all 40 texts, so every chunk
    # duplicates every earlier chunk AND later chunks duplicate within
    for i in range(4):
        pdf.iloc[i * 40 : (i + 1) * 40].to_parquet(str(src / f"p{i:02d}.parquet"))
        time.sleep(0.02)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        dedup_stream(with_content_key(stream))
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT content_key FROM dedup_out").toPandas()

    batch = dedup_batch(
        with_content_key(spark.createDataFrame(pdf))
    ).toPandas()
    assert len(got) == 40  # one survivor per distinct text, across chunks
    assert set(got.content_key) == set(batch.content_key)


def test_stream_dedup_watermarked_bounds_state(spark, tmp_path_factory):
    """Within-watermark variant: duplicates inside the horizon are dropped;
    the kept set still covers every distinct key at least once."""
    src = tmp_path_factory.mktemp("dwstream_src")
    ck = str(tmp_path_factory.mktemp("dwstream_ck"))
    pdf = _mk_docs()
    for i in range(4):
        pdf.iloc[i * 40 : (i + 1) * 40].to_parquet(str(src / f"p{i:02d}.parquet"))
        time.sleep(0.02)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    # horizon (1 day) spans the whole 160-minute fixture → same result as
    # exact dedup, while exercising the state-evicting operator
    q = (
        dedup_stream(with_content_key(stream), watermark_col="ts", delay="1 day")
        .writeStream.format("memory")
        .queryName("dedup_wm_out")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT content_key FROM dedup_wm_out").toPandas()
    assert len(got) == 40
    assert len(set(got.content_key)) == 40
