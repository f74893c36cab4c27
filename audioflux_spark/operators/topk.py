"""BM25 top-k query operators.

Two physical strategies for the same logical query (the reference keeps
multiple kernels behind one API the same way — e.g. 7 pitch estimators,
/root/reference/python/audioflux/mir/pitch_*.py):

* ``bm25_topk_exhaustive`` — pure Catalyst DataFrame plan over the
  term-frequency table: filter by query terms (pushed to scan) → broadcast
  idf map → per-doc sum → orderBy().limit(k) (Spark plans TakeOrderedAndProject
  — a distributed bounded heap, no global sort materialized).
* index-backed block-max WAND lives in operators/wand.py (M4) and reads the
  compressed segment table instead of the raw tf table.

Top-k under a locality/total-order contract is the onset peak-pick analog
(/root/reference/src/mir/onset_algorithm.c:423-460): bounded candidate
selection with a documented tie-break (score desc, conv_id asc, turn_idx asc).
"""

from __future__ import annotations

from itertools import chain

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audioflux_spark.config import BM25Config, DEFAULT
from audioflux_spark.functions.analyzer import tokenize_series
from audioflux_spark.functions.bm25 import idf_value, tf_norm_col
from audioflux_spark.operators.tokenize import DOC_KEY, CorpusStats


def query_terms(query_text: str) -> list[str]:
    """Analyzer-consistent, order-preserving unique query terms."""
    toks = tokenize_series(pd.Series([query_text])).iloc[0]
    return list(dict.fromkeys(toks))


def bm25_topk_exhaustive(
    tf_df: DataFrame,
    doc_stats_df: DataFrame,
    corpus: CorpusStats,
    query_text: str,
    k: int = 10,
    cfg: BM25Config = DEFAULT.bm25,
) -> DataFrame:
    """Score every matching doc; return top-k under the total order.

    Plan shape at scale: `term IN (...)` prunes the tf scan (predicate
    pushdown to parquet row groups when tf is materialized sorted by term);
    the doc_stats join only sees matching docs; per-term df is a tiny agg
    collected to the driver and re-broadcast as a literal map (the
    "precomputed filterbank matrix" move, SURVEY §2.5).
    """
    terms = query_terms(query_text)
    spark = tf_df.sparkSession
    if not terms:
        return spark.createDataFrame([], "conv_id string, turn_idx int, score double")

    tf_q = tf_df.filter(F.col("term").isin(terms))
    # per-term document frequency over the full corpus (tf table is corpus-wide)
    df_rows = tf_q.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
    idf_map = {r["term"]: idf_value(corpus.n_docs, int(r["df"])) for r in df_rows}
    if not idf_map:
        return spark.createDataFrame([], "conv_id string, turn_idx int, score double")

    idf_expr = F.create_map(
        *chain.from_iterable((F.lit(t), F.lit(w)) for t, w in idf_map.items())
    )
    scored = (
        tf_q.join(doc_stats_df, on=DOC_KEY)
        .withColumn(
            "part_score",
            idf_expr[F.col("term")]
            * tf_norm_col(F.col("tf"), F.col("doc_len"), corpus.avgdl, cfg),
        )
        .groupBy(*DOC_KEY)
        .agg(F.sum("part_score").alias("score"))
    )
    return scored.orderBy(
        F.col("score").desc(), F.col("conv_id").asc(), F.col("turn_idx").asc()
    ).limit(k)


def bm25_topk_conjunctive(
    tf_df: DataFrame,
    doc_stats_df: DataFrame,
    corpus: CorpusStats,
    query_text: str,
    k: int = 10,
    cfg: BM25Config = DEFAULT.bm25,
) -> DataFrame:
    """Boolean-AND retrieval: only docs containing EVERY query term are
    candidates, ranked by the same BM25 total order (the OR-semantics WAND
    top-k cannot be post-filtered for this — a partial-match doc can
    out-score a full-match one, so the true AND top-k may sit arbitrarily
    deep in the OR ranking). A query term absent from the corpus empties
    the result (strict AND).

    Plan shape at scale: identical to the exhaustive path — `term IN`
    pruning, broadcast idf literal, one per-doc aggregation — with the
    intersection folded INTO that aggregation as `count(*) == n_terms`
    (the tf table holds one row per (doc, term), so the count is the
    number of distinct query terms the doc contains); map-side combinable,
    no extra join or shuffle over the OR plan, then TakeOrderedAndProject.
    """
    terms = query_terms(query_text)
    spark = tf_df.sparkSession
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not terms:
        return empty
    tf_q = tf_df.filter(F.col("term").isin(terms))
    df_rows = tf_q.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
    idf_map = {r["term"]: idf_value(corpus.n_docs, int(r["df"])) for r in df_rows}
    if len(idf_map) < len(terms):
        return empty  # a query term matches no doc — the AND set is empty
    idf_expr = F.create_map(
        *chain.from_iterable((F.lit(t), F.lit(w)) for t, w in idf_map.items())
    )
    scored = (
        tf_q.join(doc_stats_df, on=DOC_KEY)
        .withColumn(
            "part_score",
            idf_expr[F.col("term")]
            * tf_norm_col(F.col("tf"), F.col("doc_len"), corpus.avgdl, cfg),
        )
        .groupBy(*DOC_KEY)
        .agg(
            F.sum("part_score").alias("score"),
            F.count(F.lit(1)).alias("n_hit"),
        )
        .filter(F.col("n_hit") == len(terms))
        .drop("n_hit")
    )
    return scored.orderBy(
        F.col("score").desc(), F.col("conv_id").asc(), F.col("turn_idx").asc()
    ).limit(k)
