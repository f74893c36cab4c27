"""Sequential per-group DP operators — Viterbi decoding (SURVEY §2.10).

The reference ships HMM Baum-Welch + Viterbi as C kernels
(/root/reference/src/classic/viterbi.c:28-118, hmm.c:32-120) applied to one
sequence at a time. Spark-first restatement: the DP is inherently sequential
*within* a sequence but embarrassingly parallel *across* sequences — exactly
applyInPandas' shape. The inner DP is vectorized over states (NumPy), per-
step Python is over time only (the DP recurrence, irreducible).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


@dataclass(frozen=True)
class GaussianHMM:
    """Fixed-parameter HMM with per-state Gaussian emissions over a scalar
    observable (parameters supplied, not learned — decoding only)."""

    init: tuple[float, ...] = (0.5, 0.5)
    trans: tuple[tuple[float, ...], ...] = ((0.9, 0.1), (0.1, 0.9))
    means: tuple[float, ...] = (0.0, 1.0)
    stds: tuple[float, ...] = (1.0, 1.0)

    def log_emission(self, x: np.ndarray) -> np.ndarray:
        """(T,) observations → (T, S) log density."""
        mu = np.asarray(self.means)
        sd = np.asarray(self.stds)
        z = (x[:, None] - mu[None, :]) / sd[None, :]
        return -0.5 * z * z - np.log(sd[None, :]) - 0.5 * np.log(2 * np.pi)


def viterbi_path(x: np.ndarray, hmm: GaussianHMM) -> np.ndarray:
    """Max-likelihood state path (log domain; NumPy over states)."""
    T = x.size
    if T == 0:
        return np.zeros(0, dtype=np.int32)
    log_e = hmm.log_emission(x)
    log_t = np.log(np.asarray(hmm.trans))
    delta = np.log(np.asarray(hmm.init)) + log_e[0]
    psi = np.zeros((T, delta.size), dtype=np.int32)
    for t in range(1, T):
        cand = delta[:, None] + log_t  # (from, to)
        psi[t] = np.argmax(cand, axis=0)
        delta = cand[psi[t], np.arange(delta.size)] + log_e[t]
    path = np.zeros(T, dtype=np.int32)
    path[-1] = int(np.argmax(delta))
    for t in range(T - 2, -1, -1):
        path[t] = psi[t + 1][path[t + 1]]
    return path


def nmf_factorize(
    V: np.ndarray,
    k: int,
    max_iter: int = 100,
    thresh: float = 1e-3,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Non-negative matrix factorization, multiplicative updates
    (Lee & Seung 2001; the reference's /root/reference/src/classic/nmf.c:20
    exposes the same (max_iter, thresh) contract). Deterministic given seed.

    Returns (W (m,k), H (k,n), frobenius_error)."""
    rng = np.random.default_rng(seed)
    m, n = V.shape
    W = rng.random((m, k)) + 1e-4
    H = rng.random((k, n)) + 1e-4
    prev = np.inf
    for _ in range(max_iter):
        H *= (W.T @ V) / np.maximum(W.T @ W @ H, 1e-12)
        W *= (V @ H.T) / np.maximum(W @ H @ H.T, 1e-12)
        err = float(np.linalg.norm(V - W @ H))
        if prev - err < thresh:
            break
        prev = err
    return W, H, err


def nmf_topics(
    df: DataFrame,
    group_col: str,
    row_col: str,
    col_col: str,
    value_col: str,
    k: int = 4,
    max_iter: int = 60,
) -> DataFrame:
    """Per-group NMF over a sparse (row, col, value) matrix — e.g. topics per
    corpus slice from the (doc, term, tf) matrix. Groups are independent →
    applyInPandas (the reference factors one spectrogram matrix at a time;
    we factor every group's matrix in parallel).

    Output: (group, row_id, topic, weight) — each row's dominant factor
    loading (argmax of W) plus its weight, the engine's topic assignment.
    """

    def factorize(pdf: pd.DataFrame) -> pd.DataFrame:
        rows, row_ix = np.unique(pdf[row_col].to_numpy(), return_inverse=True)
        cols, col_ix = np.unique(pdf[col_col].to_numpy(), return_inverse=True)
        V = np.zeros((rows.size, cols.size))
        V[row_ix, col_ix] = pdf[value_col].to_numpy(dtype=np.float64)
        kk = min(k, rows.size, cols.size)
        W, _H, _err = nmf_factorize(V, kk, max_iter=max_iter)
        topic = np.argmax(W, axis=1).astype(np.int32)
        weight = W[np.arange(rows.size), topic]
        return pd.DataFrame(
            {
                "group": pdf[group_col].iloc[0],
                "row_id": rows,
                "topic": topic,
                "weight": weight,
            }
        )

    row_t = dict(df.dtypes)[row_col]
    return df.groupBy(group_col).applyInPandas(
        factorize,
        schema=f"group {dict(df.dtypes)[group_col]}, row_id {row_t}, topic int, weight double",
    )


def viterbi_decode(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    hmm: GaussianHMM | None = None,
) -> DataFrame:
    """Per-group Viterbi over a scalar column; returns the input keys + state.

    Output: (group, order_cols..., state int). Deterministic given the model
    and the (group, order) total order.
    """
    hmm = hmm or GaussianHMM()

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols).reset_index(drop=True)
        states = viterbi_path(pdf[value_col].to_numpy(dtype=np.float64), hmm)
        out = pdf[[group_col, *order_cols]].copy()
        out["state"] = states
        return out

    schema_cols = ", ".join(
        f"{c} {t}"
        for c, t in zip(
            [group_col, *order_cols, "state"],
            [dict(df.dtypes)[group_col]]
            + [dict(df.dtypes)[c] for c in order_cols]
            + ["int"],
        )
    )
    return df.groupBy(group_col).applyInPandas(decode, schema=schema_cols)
