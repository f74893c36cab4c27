"""Approximate nearest neighbor over embedding columns — IVF with trained
centroids (the scale path; brute-force cosine stays as the exactness oracle).

The reference's chroma filterbank groups frequency bins by pitch-class before
aggregation (/root/reference/python/audioflux/feature/chroma*.py) — IVF is
the same move over embedding space: a coarse quantizer (k-means centroids)
buckets vectors, and a query probes only its ``nprobe`` nearest buckets
instead of scanning the corpus (Jégou et al., "Product Quantization for
Nearest Neighbor Search", IEEE TPAMI 2011 — the IVF part, no PQ).

Determinism contract (shared with the DuckDB referee): training is plain
Lloyd iterations seeded by the first-k distinct vectors (no RNG); assignment
uses the same elementwise-multiply + last-axis pairwise sum in the executor
UDF and the single-node referee, so bucket ids are bit-identical. At 100 TB
the trainer sees a bounded deterministic sample (vec_id < sample_n, a pushed-
down filter), which is how FAISS trains coarse quantizers too.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dots(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) dot products with a deterministic reduction order: the last-axis
    pairwise sum is independent of batch size (unlike BLAS matmul blocking),
    so executor batches and the single-node referee agree bitwise."""
    return (X[:, None, :] * C[None, :, :]).sum(axis=-1)


def kmeans_train(X: np.ndarray, k: int, n_iter: int = 10) -> np.ndarray:
    """Deterministic Lloyd k-means (cosine geometry: vectors and centroids
    L2-normalized each round). Init is greedy farthest-point (k-means++ with
    the argmax instead of a draw): c₀ = x₀, then each next centroid is the
    point least similar to its nearest chosen centroid — deterministic, no
    RNG, and immune to the first-k-rows-in-one-cluster collapse."""
    X = np.asarray(X, dtype=np.float64)
    Xn = X / np.maximum(np.sqrt((X * X).sum(axis=1, keepdims=True)), 1e-12)
    C = np.empty((k, Xn.shape[1]), dtype=np.float64)
    C[0] = Xn[0]
    best_sim = Xn @ C[0]  # nearest-chosen similarity per point
    for j in range(1, k):
        nxt = int(np.argmin(best_sim))  # farthest point (first index on ties)
        C[j] = Xn[nxt]
        np.maximum(best_sim, Xn @ C[j], out=best_sim)
    for _ in range(n_iter):
        assign = np.argmax(_dots(Xn, C), axis=1)
        for j in range(k):
            sel = Xn[assign == j]
            if len(sel):
                m = sel.sum(axis=0)
                C[j] = m / np.maximum(np.sqrt((m * m).sum()), 1e-12)
    return C


def ivf_assign_np(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Bucket id per vector — the single shared assignment rule."""
    X = np.asarray(X, dtype=np.float64)
    Xn = X / np.maximum(np.sqrt((X * X).sum(axis=1, keepdims=True)), 1e-12)
    return np.argmax(_dots(Xn, C), axis=1).astype(np.int32)


def ivf_assignments(emb: DataFrame, C: np.ndarray,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, bucket) via an Arrow-batched kernel (centroids broadcast by
    closure; assignment math identical to the referee's)."""

    def assign(batches):
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "bucket": ivf_assign_np(X, C)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, bucket int"
    )


def ivf_probe_buckets(qv: np.ndarray, C: np.ndarray, nprobe: int) -> list[int]:
    """The query's nprobe nearest centroids (descending affinity, ties by
    bucket id via stable argsort)."""
    d = _dots(qv[None, :], C)[0]
    order = np.argsort(-d, kind="stable")
    return [int(b) for b in order[:nprobe]]
