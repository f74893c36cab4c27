"""Block-max WAND top-k over the compressed segment table (M4).

The reference's onset peak-pick (/root/reference/src/mir/onset_algorithm.c:
423-460) selects bounded candidates using *local* windowed bounds (local max,
local avg + delta) — block-max WAND (Ding & Suel, SIGIR 2011) is the same
idea over posting lists: per-block exact upper bounds let the scorer skip
every region that cannot beat the current k-th score (θ).

Vectorization contract (input_hint: no per-row Python): classic WAND chases
per-document pointers — hostile to NumPy — so this kernel prunes at *block*
granularity instead: elementary doc-id intervals are formed from the union of
all query terms' block boundaries, each interval gets the exact upper bound
Σ_t idf_t · blockmax_t(interval), intervals are processed in descending bound
order with whole-interval vectorized scoring, and processing stops once the
next bound cannot reach θ (with a 1e-9 float-safety margin). Pruning power is
identical to doc-at-a-time BMW up to block resolution; all inner loops are
NumPy. Property-tested against exhaustive scoring (tests/test_index_wand.py).

Two query surfaces:
* ``bm25_topk_indexed``  — single query, blobs fetched via a pruned segment
  scan (term IN (...) hits parquet min/max on the term-sorted files).
* ``bm25_topk_many``     — a DataFrame of queries joined to segments and
  scored per-query in parallel via applyInPandas (the serving path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audioflux_spark.functions.bm25 import idf_value
from audioflux_spark.functions.codec import decode_postings, varint_decode
from audioflux_spark.operators.topk import query_terms
from audioflux_spark.sources.segments import IndexReader

_EPS = 1e-9


def _decode_term(row, avgdl: float, k1: float, b: float, n_docs: int):
    """Segment row → (doc_ids, contributions, block_firsts, block_ends, block_ubs)."""
    n = int(row["df"])
    doc_ids = decode_postings(bytes(row["doc_blob"]), n)
    tf = varint_decode(bytes(row["tf_blob"]), n).astype(np.float64)
    dl = varint_decode(bytes(row["dl_blob"]), n).astype(np.float64)
    idf = idf_value(n_docs, n)
    contrib = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    firsts = np.asarray(row["block_firsts"], dtype=np.int64)
    counts = np.asarray(row["block_counts"], dtype=np.int64)
    ends = doc_ids[np.cumsum(counts) - 1]  # last doc id of each block
    ubs = idf * np.asarray(row["block_maxes"], dtype=np.float64)
    return doc_ids, contrib, firsts, ends, ubs


def wand_topk_kernel(
    term_rows: list,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max pruned top-k. Returns (doc_ids, scores) sorted by
    (score desc, doc_id asc); len ≤ k."""
    if not term_rows or k <= 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)

    terms = [_decode_term(r, avgdl, k1, b, n_docs) for r in term_rows]

    # elementary intervals from the union of block boundaries
    points = np.unique(
        np.concatenate(
            [t[2] for t in terms] + [t[3] + 1 for t in terms]
        )
    )
    n_iv = points.size - 1
    if n_iv <= 0:
        # single boundary point can only happen with empty lists
        n_iv = 0
    total_ub = np.zeros(max(n_iv, 0), dtype=np.float64)
    for doc_ids, contrib, firsts, ends, ubs in terms:
        # block index covering each interval start
        ix = np.searchsorted(firsts, points[:-1], side="right") - 1
        valid = (ix >= 0) & (points[:-1] <= ends[np.clip(ix, 0, len(ends) - 1)])
        total_ub += np.where(valid, ubs[np.clip(ix, 0, len(ubs) - 1)], 0.0)

    order = np.argsort(-total_ub, kind="stable")

    # bounded top-k state, kept sorted by (score desc, doc_id asc); a doc
    # belongs to exactly one elementary interval, so merges never duplicate
    top_d = np.zeros(0, dtype=np.int64)
    top_s = np.zeros(0, dtype=np.float64)
    theta = -np.inf

    for iv in order:
        if top_d.size == k and total_ub[iv] < theta - _EPS:
            break
        lo, hi = points[iv], points[iv + 1]
        cand_docs = []
        cand_scores = []
        for doc_ids, contrib, _, _, _ in terms:
            s = np.searchsorted(doc_ids, lo, side="left")
            e = np.searchsorted(doc_ids, hi, side="left")
            if e > s:
                cand_docs.append(doc_ids[s:e])
                cand_scores.append(contrib[s:e])
        if not cand_docs:
            continue
        docs = np.concatenate(cand_docs)
        scores = np.concatenate(cand_scores)
        u_docs, inv = np.unique(docs, return_inverse=True)
        u_scores = np.zeros(u_docs.size, dtype=np.float64)
        np.add.at(u_scores, inv, scores)
        all_d = np.concatenate([top_d, u_docs])
        all_s = np.concatenate([top_s, u_scores])
        sel = np.lexsort((all_d, -all_s))[:k]
        top_d, top_s = all_d[sel], all_s[sel]
        if top_d.size == k:
            theta = top_s[-1]

    return top_d, top_s


def bm25_topk_indexed(reader: IndexReader, query_text: str, k: int = 10) -> DataFrame:
    """Single-query top-k via the compressed index; returns
    (conv_id, turn_idx, score) in (score desc, conv_id, turn_idx) order."""
    spark = reader.spark
    meta = reader.meta
    terms = query_terms(query_text)
    empty = spark.createDataFrame([], "conv_id string, turn_idx int, score double")
    if not terms:
        return empty
    rows = reader.segments.filter(F.col("term").isin(terms)).collect()
    if not rows:
        return empty
    doc_ids, scores = wand_topk_kernel(
        rows, meta.n_docs, meta.avgdl, meta.k1, meta.b, k
    )
    if doc_ids.size == 0:
        return empty
    hits = spark.createDataFrame(
        pd.DataFrame({"doc_id": doc_ids, "score": scores, "rank": np.arange(doc_ids.size)})
    )
    # docID order IS (conv_id, turn_idx) order (dense ids assigned in range-
    # partitioned sort order), so rank is already the final total order.
    out = (
        reader.docstore.join(F.broadcast(hits), on="doc_id")
        .select("conv_id", "turn_idx", "score", "rank")
        .orderBy("rank")
        .drop("rank")
    )
    return out


def bm25_topk_many(reader: IndexReader, queries: list[tuple[str, str, int]]) -> DataFrame:
    """Distributed batch query path: [(query_id, query_text, k)] → one WAND
    task per query via groupBy(query_id).applyInPandas.

    Scale shape: the query table is tiny and broadcast into a join against
    the term-sorted segment table (at cluster scale this is a broadcast-hash
    join whose probe side is pruned by term min/max); the shuffle that feeds
    applyInPandas carries only matching blobs.
    """
    spark = reader.spark
    meta = reader.meta
    qrows = []
    for qid, text, k in queries:
        for t in query_terms(text):
            qrows.append((qid, t, k))
    if not qrows:
        return spark.createDataFrame(
            [], "query_id string, conv_id string, turn_idx int, score double, rank int"
        )
    qdf = spark.createDataFrame(qrows, "query_id string, term string, k int")
    joined = reader.segments.join(F.broadcast(qdf), on="term")

    n_docs, avgdl, k1, b = meta.n_docs, meta.avgdl, meta.k1, meta.b

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        k = int(pdf["k"].iloc[0])
        rows = [pdf.iloc[i] for i in range(len(pdf))]
        doc_ids, scores = wand_topk_kernel(rows, n_docs, avgdl, k1, b, k)
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "doc_id": doc_ids,
                "score": scores,
                "rank": np.arange(doc_ids.size, dtype=np.int32),
            }
        )

    hits = joined.groupBy("query_id").applyInPandas(
        score_group, schema="query_id string, doc_id long, score double, rank int"
    )
    return (
        hits.join(reader.docstore.select("doc_id", "conv_id", "turn_idx"), on="doc_id")
        .select("query_id", "conv_id", "turn_idx", "score", "rank")
    )
