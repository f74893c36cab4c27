"""Tokenize + per-doc/per-term statistics — fully JVM-side Catalyst plans.

Analog of the reference's framing stage + per-frame reductions
(/root/reference/src/stft_algorithm.c:813-833 framing;
/root/reference/src/feature/spectral_algorithm.c per-frame stats): the raw
text row expands to a token sequence, and all index statistics (tf, df,
doc_len, corpus N/avgdl) are one-pass grouped reductions.

Scale notes (100 TB): `term_freqs` is explode → groupBy(doc, term). Catalyst
plans this as partial hash-aggregate *before* the shuffle (map-side combine),
so the shuffle carries (doc, term, partial tf) — already compacted — not raw
tokens. doc_len/corpus stats never explode at all: `F.size(split(...))` keeps
the count computation inside whole-stage codegen with zero data expansion.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audioflux_spark.config import AnalyzerConfig, DEFAULT
from audioflux_spark.functions.analyzer import doc_len_col, tokens_col

DOC_KEY = ["conv_id", "turn_idx"]


def term_freqs(
    transcripts: DataFrame, cfg: AnalyzerConfig = DEFAULT.analyzer
) -> DataFrame:
    """(conv_id, turn_idx, term, tf) — one row per distinct term per turn."""
    return (
        transcripts.select(*DOC_KEY, F.explode(tokens_col("text", cfg)).alias("term"))
        .groupBy(*DOC_KEY, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_stats(
    transcripts: DataFrame, cfg: AnalyzerConfig = DEFAULT.analyzer
) -> DataFrame:
    """(conv_id, turn_idx, doc_len) without exploding tokens."""
    return transcripts.select(
        *DOC_KEY, doc_len_col("text", cfg).cast("long").alias("doc_len")
    )


def doc_freqs(tf_df: DataFrame) -> DataFrame:
    """(term, df) — number of turns containing each term."""
    return tf_df.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


@dataclass(frozen=True)
class CorpusStats:
    n_docs: int
    avgdl: float


def corpus_stats(
    transcripts: DataFrame, cfg: AnalyzerConfig = DEFAULT.analyzer
) -> CorpusStats:
    row = (
        transcripts.select(doc_len_col("text", cfg).cast("long").alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dl").alias("total"),
        )
        .first()
    )
    n = int(row["n"]) if row["n"] else 0
    total = int(row["total"]) if row["total"] else 0
    return CorpusStats(n_docs=n, avgdl=(total / n) if n else 0.0)
