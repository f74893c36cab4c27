"""Watermarked event-time rollup: chunked stream output must equal the batch
groupBy over the concatenated input — the aggregation form of the reference's
chunk-invariance streaming contract (tail-carry, stft_algorithm.c:536-586)."""

from __future__ import annotations

import time

import numpy as np
import pandas as pd

from audioflux_spark.streaming.windowed import (
    hourly_rollup_batch,
    hourly_rollup_stream,
)


def test_windowed_stream_equals_batch(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("wstream_src")
    ck = str(tmp_path_factory.mktemp("wstream_ck"))

    rng = np.random.default_rng(23)
    base = 1_700_000_000 - (1_700_000_000 % 3600)
    rows = []
    for i in range(600):
        # 12 hours of events, mildly out of order (±20 min jitter, inside
        # the 2 h watermark) across 3 event types
        t = base + int(rng.integers(0, 12 * 3600)) + int(rng.integers(-1200, 1200))
        rows.append((max(t, base), f"type{i % 3}", float(rng.integers(1, 100)) / 10))
    pdf = pd.DataFrame(rows, columns=["t", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["t"], unit="s").astype("datetime64[us]")
    data = pdf[["ts", "event_type", "value"]]

    # time-ordered chunks + one far-future flush row: append mode only emits
    # a window once the event-time clock passes its end + watermark, so the
    # flush advances the watermark beyond every real window
    chunks = np.array_split(data.sort_values("ts").reset_index(drop=True), 5)
    for i, ch in enumerate(chunks):
        ch.to_parquet(str(src / f"part{i:02d}.parquet"))
        time.sleep(0.05)
    flush = pd.DataFrame(
        {
            "ts": pd.Series(
                [pd.Timestamp(base + 30 * 3600, unit="s")], dtype="datetime64[us]"
            ),
            "event_type": ["__flush__"],
            "value": [0.0],
        }
    )
    time.sleep(0.05)
    flush.to_parquet(str(src / "part99.parquet"))

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        hourly_rollup_stream(stream, watermark="2 hours", window="1 hour")
        .writeStream.format("memory")
        .queryName("roll_out")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = (
        spark.table("roll_out")
        .toPandas()
        .query("event_type != '__flush__'")
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    sdf = spark.createDataFrame(data)
    want = (
        hourly_rollup_batch(sdf, window="1 hour")
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(want) >= 30
    assert (got["window_start"].values == want["window_start"].values).all()
    assert (got["event_type"].values == want["event_type"].values).all()
    assert (got["n"].values == want["n"].values).all()
    assert np.allclose(got["sum_value"].values, want["sum_value"].values)
