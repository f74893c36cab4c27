"""Materialized oracle referees for the non-SQL-expressible operators.

Iterative DP/EM operators (Viterbi, NMF, Baum-Welch) have no ANSI-SQL twin —
but with fixed parameters and deterministic float order they ARE pure
functions of the input, so the oracle can be the in-repo NumPy kernels run
single-node over pandas (no Spark): the driver-side DuckDB query then reads
the materialized expected parquet and the hash check verifies the engine's
*distributed* execution (grouping, ordering, schema, Arrow exchange) against
the same math executed without Spark. The kernels' own math is independently
verified by pytest against planted-parameter fixtures (tests/test_sequence.py,
tests/test_nmf.py, tests/test_hmm.py).

Determinism contract: every kernel consumes its group's rows in a canonical
sort order (enforced inside the operators too), so float accumulation order —
and therefore every *_e6 value — is identical in both executions.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from audioflux_spark.functions.analyzer import tokenize_series
from audioflux_spark.operators.sequence import (
    GaussianHMM,
    baum_welch,
    nmf_factorize_sparse,
    viterbi_path,
)

EXPECTED_DIR = "/tmp/afspark_oracle_expected"


def _e6(a: np.ndarray) -> np.ndarray:
    return np.round(np.asarray(a, dtype=np.float64) * 1e6).astype(np.int64)


def viterbi_expected(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_id", "value"])
    outs = []
    for uid, g in ev.sort_values(["user_id", "event_id"]).groupby("user_id", sort=True):
        states = viterbi_path(g["value"].to_numpy(dtype=np.float64), GaussianHMM())
        outs.append(pd.DataFrame({
            "user_id": uid, "event_id": g["event_id"].to_numpy(), "state": states.astype(np.int32),
        }))
    return pd.concat(outs, ignore_index=True).sort_values(["user_id", "event_id"]).reset_index(drop=True)


def nmf_expected(sf_dir: str, k: int = 3, max_iter: int = 60) -> pd.DataFrame:
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "source", "text"])
    toks = tokenize_series(docs["text"])
    tf = (
        pd.DataFrame({
            "doc_id": docs["doc_id"].repeat(toks.str.len()).to_numpy(),
            "source": docs["source"].repeat(toks.str.len()).to_numpy(),
            "term": np.concatenate([t if len(t) else np.array([], dtype=object) for t in toks]),
        })
        .groupby(["source", "doc_id", "term"], sort=True)
        .size()
        .rename("tf")
        .reset_index()
    )
    outs = []
    for src, g in tf.groupby("source", sort=True):
        # identical canonical order + unique/inverse as the Spark kernel
        g = g.sort_values(["doc_id", "term"]).reset_index(drop=True)
        rows, row_ix = np.unique(g["doc_id"].to_numpy(), return_inverse=True)
        cols, col_ix = np.unique(g["term"].to_numpy(), return_inverse=True)
        vals = g["tf"].to_numpy(dtype=np.float64)
        kk = min(k, rows.size, cols.size)
        W, _H, _err = nmf_factorize_sparse(row_ix, col_ix, vals, rows.size, cols.size, kk,
                                           max_iter=max_iter)
        topic = np.argmax(W, axis=1).astype(np.int32)
        outs.append(pd.DataFrame({
            "group": src, "row_id": rows, "topic": topic,
            "weight_e6": _e6(W[np.arange(rows.size), topic]),
        }))
    return pd.concat(outs, ignore_index=True).sort_values(["group", "row_id"]).reset_index(drop=True)


def hmm_expected(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_id", "value"])
    outs = []
    for uid, g in ev.sort_values(["user_id", "event_id"]).groupby("user_id", sort=True):
        fitted, ll, iters = baum_welch(g["value"].to_numpy(dtype=np.float64), GaussianHMM())
        order = np.argsort(np.asarray(fitted.means))
        A = np.asarray(fitted.trans)[order][:, order]
        outs.append(pd.DataFrame({
            "group": uid,
            "state": np.arange(order.size, dtype=np.int32),
            "init_p_e6": _e6(np.asarray(fitted.init)[order]),
            "mean_e6": _e6(np.asarray(fitted.means)[order]),
            "std_e6": _e6(np.asarray(fitted.stds)[order]),
            "stay_p_e6": _e6(np.diag(A)),
            "n_iter": np.int32(iters),
            "n_obs": np.int64(len(g)),
        }))
    return pd.concat(outs, ignore_index=True).sort_values(["group", "state"]).reset_index(drop=True)


def ann_assign_expected(
    sf_dir: str, k: int = 8, nprobe: int = 2, sample_n: int = 2048
) -> tuple[pd.DataFrame, list[int], pd.DataFrame]:
    """(vec_id → bucket) assignment table, the query's probe buckets, and the
    trained centroid table (bucket, centroid DOUBLE[]), via the SAME shared
    kmeans/assign routines the engine's executors run (bit-identical by the
    deterministic-reduction contract in operators/ann.py). The centroid
    coordinates are exact float64 — identical to what build_ivf_index writes
    into the artifact's centroids/ parquet."""
    from audioflux_spark.operators.ann import (
        ivf_assign_np,
        ivf_probe_buckets,
        kmeans_train,
    )

    emb = pd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).sort_values("vec_id").reset_index(drop=True)
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    vec_ids = emb["vec_id"].to_numpy()
    C = kmeans_train(X[vec_ids < sample_n], k)
    buckets = ivf_assign_np(X, C)
    qv = X[int(np.flatnonzero(vec_ids == 0)[0])]
    probes = ivf_probe_buckets(qv, C, nprobe)
    return (
        pd.DataFrame({"vec_id": vec_ids.astype(np.int64), "bucket": buckets}),
        probes,
        pd.DataFrame(
            {"bucket": np.arange(len(C), dtype=np.int64),
             "centroid": [C[j].tolist() for j in range(len(C))]}
        ),
    )


def materialize(name: str, df: pd.DataFrame) -> str:
    os.makedirs(EXPECTED_DIR, exist_ok=True)
    path = os.path.join(EXPECTED_DIR, f"{name}.parquet")
    df.to_parquet(path, index=False)
    return path
