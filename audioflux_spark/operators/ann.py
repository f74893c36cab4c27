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


# ------------------------------------------------- persisted index artifact


def build_ivf_index(
    spark,
    emb: DataFrame,
    out_dir: str,
    k: int = 8,
    train_sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize a build-once/query-many IVF index (the segments/docstore
    discipline applied to ANN — FAISS's train-then-add, persisted):

        out_dir/centroids/   k rows (bucket, centroid array<double>)
        out_dir/vectors/     (id, vector) PARTITIONED BY bucket
        out_dir/meta.json    k, train_sample, dim

    Training is the deterministic farthest-point k-means on a bounded
    id-pushdown sample (driver holds sample_n × dim floats, nothing more);
    assignment is the Arrow-batched kernel over the full table. Vectors are
    copied INTO the index partitioned by bucket, so a query's nprobe probes
    become partition pruning — no join back to the source table, and queries
    never retrain or re-collect anything."""
    import json
    import os

    from pyspark.sql import functions as F

    rows = emb.filter(F.col(id_col) < train_sample).select(id_col, vec_col).collect()
    rows.sort(key=lambda r: r[id_col])
    X = np.array([r[vec_col] for r in rows], dtype=np.float64)
    C = kmeans_train(X, k)
    os.makedirs(out_dir, exist_ok=True)
    cdf = spark.createDataFrame(
        [(j, [float(x) for x in C[j]]) for j in range(k)],
        "bucket int, centroid array<double>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, "centroids"))
    assign = ivf_assignments(emb, C, id_col, vec_col)
    (
        emb.select(id_col, vec_col)
        .join(assign.withColumnRenamed("vec_id", id_col), id_col)
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(os.path.join(out_dir, "vectors"))
    )
    meta = {"k": k, "train_sample": train_sample, "dim": int(X.shape[1])}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, sort_keys=True)


class IVFReader:
    """Opens a persisted IVF index: centroids pinned on the driver (k × dim
    floats — bounded), vectors as a bucket-partitioned DataFrame. meta.json
    is written last, so its presence marks a complete artifact."""

    def __init__(self, spark, index_dir: str, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        import json
        import os

        self.spark = spark
        self.dir = index_dir
        self.id_col, self.vec_col = id_col, vec_col
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        crows = spark.read.parquet(os.path.join(index_dir, "centroids")).collect()
        crows.sort(key=lambda r: r["bucket"])
        self.C = np.array([r["centroid"] for r in crows], dtype=np.float64)
        self.vectors: DataFrame = spark.read.parquet(
            os.path.join(index_dir, "vectors")
        )

    def probes(self, qv: np.ndarray, nprobe: int) -> list[int]:
        return ivf_probe_buckets(np.asarray(qv, dtype=np.float64), self.C, nprobe)

    def search_cosine(self, qv, k: int | None = 10, nprobe: int = 2) -> DataFrame:
        """Exact cosine INSIDE the nprobe nearest buckets. The bucket filter
        is a partition-pruning predicate on the artifact scan (~nprobe/k of
        the corpus read); the cosine is pure JVM (zip_with + aggregate).
        Returns (id, cos double), score-descending with id tie-break;
        k=None returns every candidate (callers applying their own rounding
        discipline order/limit themselves)."""
        from pyspark.sql import functions as F

        probes = self.probes(qv, nprobe)
        qlit = F.array(*[F.lit(float(x)) for x in qv])

        def dot(a, b):
            return F.aggregate(
                F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
            )

        ev = F.col(self.vec_col).cast("array<double>")
        cos = dot(ev, qlit) / (F.sqrt(dot(ev, ev)) * F.sqrt(dot(qlit, qlit)))
        out = self.vectors.filter(F.col("bucket").isin(probes)).select(
            F.col(self.id_col), cos.alias("cos")
        )
        if k is None:
            return out
        return out.orderBy(F.desc("cos"), self.id_col).limit(k)
