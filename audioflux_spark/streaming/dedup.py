"""Streaming ingest dedup — the online form of ``dedup_exact``.

A training-data pipeline that ingests continuously cannot re-run batch dedup
over the full corpus per delivery; the Spark-native form is a streaming
`dropDuplicates` on the content key: Structured Streaming keeps the
seen-key set as operator state HASH-PARTITIONED BY KEY across executors
(RocksDB-backed in production), so each micro-batch probes only its own
shards — the same sharded-set shape a 10^12-turn ingest needs, with no
driver-side membership structure anywhere.

Two state regimes:
  * unbounded (default): exact global dedup; state grows with distinct keys
    — the right contract for corpus construction, where "seen once ever"
    is the semantic and the state IS the corpus fingerprint set.
  * watermarked: `dropDuplicatesWithinWatermark` bounds state to the
    watermark horizon — the right contract for feed-style ingest where
    duplicates only arrive near-in-time (e.g. re-crawls, at-least-once
    delivery), trading unbounded memory for a bounded dedup window.

Chunk-invariance contract (the streaming discipline the reference pins for
its chunked readers — /root/reference/src/stft_algorithm.c:536-586): the
KEPT KEY SET equals the batch ``dropDuplicates`` over the concatenated
input regardless of micro-batch chunking; which physical row represents a
key is delivery-order-dependent in both engines (verified by
tests/test_streaming_dedup.py on the key set, not row identity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_key(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the dedup key: md5 of the raw text (exact-dup semantics —
    near-dup belongs to the MinHash/SimHash family, not the ingest gate)."""
    return docs.withColumn("content_key", F.md5(F.col(text_col)))


def dedup_stream(
    docs: DataFrame,
    keys: list[str] | None = None,
    watermark_col: str | None = None,
    delay: str = "2 hours",
) -> DataFrame:
    """First-seen-wins streaming dedup over ``keys``.

    ``docs`` is a STREAMING DataFrame (``spark.readStream...``). With
    ``watermark_col`` set, uses ``dropDuplicatesWithinWatermark`` so the
    key state is evicted ``delay`` past the event-time clock; otherwise
    exact unbounded dedup. Output mode: append (each kept row emitted
    exactly once)."""
    keys = keys or ["content_key"]
    if watermark_col is not None:
        return docs.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
            keys
        )
    return docs.dropDuplicates(keys)


def dedup_batch(docs: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Batch twin (the oracle in tests): one row per key."""
    return docs.dropDuplicates(keys or ["content_key"])
