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
from audioflux_spark.functions.codec import delta_decode_segmented, varint_decode
from audioflux_spark.operators.topk import query_terms
from audioflux_spark.sources.segments import IndexReader

_EPS = 1e-9


def _decode_term(row, avgdl: float, k1: float, b: float, idf: float, ub_scale: float):
    """Segment row → (doc_ids, contributions, block_firsts, block_ends, block_ubs).

    ``idf`` is supplied by the caller (GLOBAL df across index generations, not
    the row's per-generation df). ``ub_scale ≥ 1`` widens the stored block
    maxes when the query-time avgdl exceeds the build-time avgdl of this
    row's generation (tf-norm is monotone increasing in avgdl, bounded by the
    avgdl ratio) — keeps the bounds safe for incremental indexes.
    """
    n = int(row["df"])
    gaps = varint_decode(bytes(row["doc_blob"]), n).astype(np.int64)
    part_counts = np.asarray(row["part_counts"], dtype=np.int64)
    doc_ids = delta_decode_segmented(gaps, part_counts)
    tf = varint_decode(bytes(row["tf_blob"]), n).astype(np.float64)
    dl = varint_decode(bytes(row["dl_blob"]), n).astype(np.float64)
    contrib = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    firsts = np.asarray(row["block_firsts"], dtype=np.int64)
    counts = np.asarray(row["block_counts"], dtype=np.int64)
    ends = doc_ids[np.cumsum(counts) - 1]  # last doc id of each block
    ubs = idf * ub_scale * np.asarray(row["block_maxes"], dtype=np.float64)
    return doc_ids, contrib, firsts, ends, ubs


def wand_topk_kernel(
    term_rows: list,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
    k: int,
    idfs: list[float] | None = None,
    ub_scale: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max pruned top-k. Returns (doc_ids, scores) sorted by
    (score desc, doc_id asc); len ≤ k. idfs defaults to per-row Lucene idf
    from (n_docs, row df) — pass explicit values for multi-generation
    indexes where df is global."""
    if not term_rows or k <= 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    if idfs is None:
        idfs = [idf_value(n_docs, int(r["df"])) for r in term_rows]

    terms = [
        _decode_term(r, avgdl, k1, b, i, ub_scale)
        for r, i in zip(term_rows, idfs)
    ]

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
    # belongs to exactly one elementary interval, so merges never duplicate.
    # Docs TYING the k-th score are kept (capped): docIDs are only key-ordered
    # within a partition, so boundary ties must be resolved by the caller
    # against the real (conv_id, turn_idx) keys — dropping a tied doc here
    # could drop the one with the smallest key.
    max_keep = max(4 * k, k + 1024)
    top_d = np.zeros(0, dtype=np.int64)
    top_s = np.zeros(0, dtype=np.float64)
    theta = -np.inf

    for iv in order:
        if top_d.size >= k and total_ub[iv] < theta - _EPS:
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
        sel = np.lexsort((all_d, -all_s))
        if sel.size > k:
            s_sorted = all_s[sel]
            kth = s_sorted[k - 1]
            cutoff = int(np.searchsorted(-s_sorted, -kth, side="right"))
            sel = sel[: min(max(k, cutoff), max_keep)]
        top_d, top_s = all_d[sel], all_s[sel]
        if top_d.size >= k:
            theta = top_s[k - 1]

    return top_d, top_s


def bm25_topk_indexed(reader: IndexReader, query_text: str, k: int = 10) -> DataFrame:
    """Single-query top-k via the compressed index; returns
    (conv_id, turn_idx, score) in (score desc, conv_id, turn_idx) order.

    Multi-generation: each generation runs its own WAND with GLOBAL stats
    (N, avgdl, df summed over generations — scores are exact global BM25).
    The kernel keeps every doc tying the k-th score, and the final ranking
    here resolves all ties by the real (conv_id, turn_idx) keys, so the
    result is rank-identical to the oracle regardless of docID assignment
    order (docIDs are only key-ordered within a build partition).
    """
    spark = reader.spark
    k1, b = reader.meta.k1, reader.meta.b
    terms = query_terms(query_text)
    empty = spark.createDataFrame([], "conv_id string, turn_idx int, score double")
    if not terms or k <= 0:
        return empty

    gen_rows = [
        g.segments.filter(F.col("term").isin(terms)).collect()
        for g in reader.generations
    ]
    n_docs, avgdl = reader.n_docs, reader.avgdl
    global_df: dict[str, int] = {}
    for rows in gen_rows:
        for r in rows:
            global_df[r["term"]] = global_df.get(r["term"], 0) + int(r["df"])
    if not global_df:
        return empty

    cands = []
    for g, rows in zip(reader.generations, gen_rows):
        if not rows:
            continue
        idfs = [idf_value(n_docs, global_df[r["term"]]) for r in rows]
        ub_scale = max(1.0, avgdl / g.meta.avgdl) if g.meta.avgdl else 1.0
        doc_ids, scores = wand_topk_kernel(
            rows, n_docs, avgdl, k1, b, k, idfs=idfs, ub_scale=ub_scale
        )
        if doc_ids.size == 0:
            continue
        # doc_id IN (...) pushes to the docstore parquet scan (docIDs sorted
        # within each seg_id dir → row-group min/max pruning): ~k row groups
        # read, not the corpus.
        keys = (
            g.docstore.filter(F.col("doc_id").isin(doc_ids.tolist()))
            .select("doc_id", "conv_id", "turn_idx")
            .toPandas()
            .set_index("doc_id")
        )
        cands.append(
            pd.DataFrame(
                {
                    "conv_id": keys.loc[doc_ids, "conv_id"].to_numpy(),
                    "turn_idx": keys.loc[doc_ids, "turn_idx"].to_numpy(),
                    "score": scores,
                }
            )
        )
    if not cands:
        return empty
    out = pd.concat(cands, ignore_index=True)
    out = out.sort_values(
        ["score", "conv_id", "turn_idx"], ascending=[False, True, True]
    ).head(k)
    return spark.createDataFrame(out, schema="conv_id string, turn_idx int, score double")


def bm25_topk_many(reader: IndexReader, queries: list[tuple[str, str, int]]) -> DataFrame:
    """Distributed batch query path: [(query_id, query_text, k)] → one WAND
    task per query via groupBy(query_id).applyInPandas.

    Scale shape: the query table is tiny and broadcast into a join against
    the term-sorted segment table (at cluster scale this is a broadcast-hash
    join whose probe side is pruned by term min/max); the shuffle that feeds
    applyInPandas carries only matching blobs.
    """
    from functools import reduce

    from pyspark.sql.window import Window

    spark = reader.spark
    k1, b = reader.meta.k1, reader.meta.b
    n_docs, avgdl = reader.n_docs, reader.avgdl
    gen_avgdl = {g.gen_id: g.meta.avgdl for g in reader.generations}

    qrows = []
    for qid, text, k in queries:
        for t in query_terms(text):
            qrows.append((qid, t, k))
    empty = spark.createDataFrame(
        [], "query_id string, conv_id string, turn_idx int, score double, rank int"
    )
    if not qrows:
        return empty
    qdf = spark.createDataFrame(qrows, "query_id string, term string, k int")
    seg_union = reduce(
        DataFrame.unionByName,
        [g.segments.withColumn("gen", F.lit(g.gen_id)) for g in reader.generations],
    )
    joined = seg_union.join(F.broadcast(qdf), on="term")

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        k = int(pdf["k"].iloc[0])
        # global df per term = sum over generations (a term appears at most
        # once per generation)
        gdf = pdf.groupby("term")["df"].sum().to_dict()
        outs = []
        for gen_id, sub in pdf.groupby("gen"):
            rows = [sub.iloc[i] for i in range(len(sub))]
            idfs = [idf_value(n_docs, int(gdf[r["term"]])) for r in rows]
            ga = gen_avgdl.get(int(gen_id), avgdl)
            ub_scale = max(1.0, avgdl / ga) if ga else 1.0
            doc_ids, scores = wand_topk_kernel(
                rows, n_docs, avgdl, k1, b, k, idfs=idfs, ub_scale=ub_scale
            )
            outs.append(
                pd.DataFrame(
                    {
                        "query_id": pdf["query_id"].iloc[0],
                        "gen": int(gen_id),
                        "doc_id": doc_ids,
                        "score": scores,
                        "k": k,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    hits = joined.groupBy("query_id").applyInPandas(
        score_group,
        schema="query_id string, gen int, doc_id long, score double, k int",
    )
    ds_union = reduce(
        DataFrame.unionByName,
        [
            g.docstore.select(
                F.lit(g.gen_id).alias("gen"), "doc_id", "conv_id", "turn_idx"
            )
            for g in reader.generations
        ],
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("conv_id").asc(), F.col("turn_idx").asc()
    )
    return (
        hits.join(ds_union, on=["gen", "doc_id"])
        .withColumn("rank", F.row_number().over(w) - 1)
        .filter(F.col("rank") < F.col("k"))
        .select("query_id", "conv_id", "turn_idx", "score", "rank")
    )
