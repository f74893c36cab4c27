"""Watermarked event-time windowed aggregation — the streaming rollup.

The reference's streaming contract is chunk-invariance: feeding a signal in
chunks must produce the same frames as one shot
(/root/reference/src/stft_algorithm.c:536-586, the isContinue tail-carry).
For aggregations the Spark-native form is Structured Streaming's event-time
tumbling window + watermark: rows may arrive in any micro-batch chunking and
out of order up to the watermark delay, and the emitted per-window rows equal
the batch groupBy over the concatenated input (verified by
tests/test_streaming_windowed.py).

At scale this is the canonical streaming rollup plan: map-side partial
aggregation per micro-batch, state keyed by (window, event_type) bounded by
the watermark horizon (closed windows are evicted), append-mode emission of
finalized windows only. No custom state code — Catalyst's streaming
aggregation operator carries the tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Event-time tumbling rollup over a STREAMING events DataFrame.

    Input schema must include ``ts`` (timestamp) , ``event_type``, ``value``.
    Returns per (window, event_type): row count and value sum. With a
    watermark, append output mode emits each window exactly once, after the
    event-time clock passes window end + watermark — late rows beyond the
    watermark are dropped deterministically.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def hourly_rollup_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """The batch twin: identical expression over a static DataFrame. The
    chunk-invariance test asserts stream output == this, row for row."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
