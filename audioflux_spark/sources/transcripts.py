"""Transcripts source — the engine's scan (audio.read analog,
/root/reference/python/audioflux/audio.py:22-106).

Catalog-agnostic (SURVEY §7.2): an Iceberg table identifier if a catalog is
configured, else a parquet path. Schema is validated on entry the way the
reference validates audio on entry (check_audio,
/root/reference/python/audioflux/utils/util.py:66-111).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

REQUIRED_COLS = ["conv_id", "turn_idx", "text"]


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Load the transcripts table from an Iceberg identifier, a directory
    containing transcripts.parquet, or a parquet file/glob."""
    if os.path.isdir(source) and os.path.exists(
        os.path.join(source, "transcripts.parquet")
    ):
        df = spark.read.parquet(os.path.join(source, "transcripts.parquet"))
    elif source.endswith(".parquet") or os.path.exists(source):
        df = spark.read.parquet(source)
    else:
        df = spark.table(source)  # Iceberg / catalog table
    missing = [c for c in REQUIRED_COLS if c not in df.columns]
    if missing:
        raise ValueError(f"transcripts source missing columns: {missing}")
    return df


def documents_as_transcripts(
    spark: SparkSession, sf_dir: str, where: str | None = None
) -> DataFrame:
    """Adapt the driver's `documents` star-schema table to the transcripts
    shape (one document == one single-turn conversation) so every engine
    operator runs unmodified over /root/testdata. ``where`` is a pushdown
    predicate over the raw documents columns (lang, source, n_chars...)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if where:
        docs = docs.filter(where)
    return docs.select(
        # %012d: string order == numeric order up to 10^12 docs (the design
        # scale), so conv_id tie-breaks stay consistent with doc_id order
        F.format_string("doc-%012d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )
