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
    m, n = V.shape
    ri, ci = np.nonzero(V)
    return nmf_factorize_sparse(
        ri, ci, V[ri, ci].astype(np.float64), m, n, k,
        max_iter=max_iter, thresh=thresh, seed=seed,
    )


def nmf_factorize_sparse(
    row_ix: np.ndarray,
    col_ix: np.ndarray,
    vals: np.ndarray,
    m: int,
    n: int,
    k: int,
    max_iter: int = 100,
    thresh: float = 1e-3,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Multiplicative-update NMF over a COO sparse matrix — never
    materializes the dense V (a 10⁶-doc × 10⁵-term slice would be a
    800 GB dense array in one task; the sparse form is O(nnz)).

      H ← H · (WᵀV) / (WᵀW · H)      W ← W · (VHᵀ) / (W · HHᵀ)

    Sparse numerators via bincount per factor (k is small); denominators via
    the k×k Grams, so per-iteration cost is O(nnz·k + (m+n)·k²). The
    Frobenius error uses ‖V−WH‖² = ‖V‖² − 2Σ_nnz v·(WH) + tr(WᵀW·HHᵀ),
    again without forming WH."""
    rng = np.random.default_rng(seed)
    W = rng.random((m, k)) + 1e-4
    H = rng.random((k, n)) + 1e-4
    v2 = float(vals @ vals)
    prev = np.inf
    err = 0.0
    for _ in range(max_iter):
        num_h = np.stack(
            [np.bincount(col_ix, weights=W[row_ix, q] * vals, minlength=n) for q in range(k)]
        )
        H *= num_h / np.maximum((W.T @ W) @ H, 1e-12)
        num_w = np.stack(
            [np.bincount(row_ix, weights=H[q, col_ix] * vals, minlength=m) for q in range(k)],
            axis=1,
        )
        W *= num_w / np.maximum(W @ (H @ H.T), 1e-12)
        wh_nnz = np.einsum("ij,ji->i", W[row_ix], H[:, col_ix])
        gram = (W.T @ W) * (H @ H.T)
        err = float(np.sqrt(max(v2 - 2.0 * float(vals @ wh_nnz) + float(gram.sum()), 0.0)))
        if prev - err < thresh:
            break
        prev = err
    return W, H, err


def baum_welch(
    x: np.ndarray,
    hmm: GaussianHMM | None = None,
    max_iter: int = 50,
    thresh: float = 1e-4,
) -> tuple[GaussianHMM, float, int]:
    """Baum-Welch EM training of a Gaussian HMM on one sequence
    (/root/reference/src/classic/hmm.c:32-120: forward/backward + EM with the
    same (max_iter, thresh) stopping contract as the reference's nmf/hmm).

    Scaled (not log-domain) forward/backward — the classic Rabiner (1989)
    recursions with per-step normalization so likelihoods never underflow;
    log-likelihood is the sum of log scale factors. All state math is NumPy;
    Python iterates over time only (irreducible recurrence).

    Returns (fitted hmm, final log-likelihood, iterations run)."""
    hmm = hmm or GaussianHMM()
    T = x.size
    S = len(hmm.init)
    if T < 2:
        return hmm, 0.0, 0
    pi = np.asarray(hmm.init, dtype=np.float64).copy()
    A = np.asarray(hmm.trans, dtype=np.float64).copy()
    mu = np.asarray(hmm.means, dtype=np.float64).copy()
    sd = np.asarray(hmm.stds, dtype=np.float64).copy()
    prev_ll = -np.inf
    ll = prev_ll
    it = 0
    for it in range(1, max_iter + 1):
        z = (x[:, None] - mu[None, :]) / sd[None, :]
        B = np.exp(-0.5 * z * z) / (sd[None, :] * np.sqrt(2 * np.pi))
        B = np.maximum(B, 1e-300)

        alpha = np.empty((T, S))
        scale = np.empty(T)
        alpha[0] = pi * B[0]
        scale[0] = alpha[0].sum()
        alpha[0] /= scale[0]
        for t in range(1, T):
            a = (alpha[t - 1] @ A) * B[t]
            scale[t] = a.sum()
            alpha[t] = a / scale[t]
        ll = float(np.log(scale).sum())

        beta = np.empty((T, S))
        beta[-1] = 1.0
        for t in range(T - 2, -1, -1):
            beta[t] = (A @ (B[t + 1] * beta[t + 1])) / scale[t + 1]

        gamma = alpha * beta
        gamma /= np.maximum(gamma.sum(axis=1, keepdims=True), 1e-300)
        # ξ summed over t in one einsum: xi_sum[i,j] = Σ_t α_t[i]·A[i,j]·B_{t+1}[j]·β_{t+1}[j]/scale_{t+1}
        xi_sum = A * np.einsum(
            "ti,tj->ij", alpha[:-1], (B[1:] * beta[1:]) / scale[1:, None]
        )

        pi = gamma[0]
        A = xi_sum / np.maximum(gamma[:-1].sum(axis=0)[:, None], 1e-300)
        A /= np.maximum(A.sum(axis=1, keepdims=True), 1e-300)
        gsum = np.maximum(gamma.sum(axis=0), 1e-300)
        mu = (gamma * x[:, None]).sum(axis=0) / gsum
        var = (gamma * (x[:, None] - mu[None, :]) ** 2).sum(axis=0) / gsum
        sd = np.sqrt(np.maximum(var, 1e-6))

        if ll - prev_ll < thresh and it > 1:
            break
        prev_ll = ll

    fitted = GaussianHMM(
        init=tuple(pi.tolist()),
        trans=tuple(tuple(r) for r in A.tolist()),
        means=tuple(mu.tolist()),
        stds=tuple(sd.tolist()),
    )
    return fitted, ll, it


def hmm_fit(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    hmm: GaussianHMM | None = None,
    max_iter: int = 50,
    thresh: float = 1e-4,
) -> DataFrame:
    """Per-group Baum-Welch training — one EM per group in parallel via
    applyInPandas (groups are independent sequences; the reference trains one
    sequence at a time, /root/reference/src/classic/hmm.c:32).

    Output: one row per (group, state) with the fitted parameters, plus the
    sequence log-likelihood and EM iteration count. States are reported in
    ascending-mean order so output is stable under label switching."""
    hmm0 = hmm or GaussianHMM()

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols).reset_index(drop=True)
        fitted, ll, iters = baum_welch(
            pdf[value_col].to_numpy(dtype=np.float64), hmm0, max_iter, thresh
        )
        order = np.argsort(np.asarray(fitted.means))
        A = np.asarray(fitted.trans)[order][:, order]
        return pd.DataFrame(
            {
                "group": pdf[group_col].iloc[0],
                "state": np.arange(order.size, dtype=np.int32),
                "init_p": np.asarray(fitted.init)[order],
                "mean": np.asarray(fitted.means)[order],
                "std": np.asarray(fitted.stds)[order],
                "stay_p": np.diag(A),
                "log_lik": ll,
                "n_iter": np.int32(iters),
                "n_obs": np.int64(len(pdf)),
            }
        )

    return df.groupBy(group_col).applyInPandas(
        fit,
        schema=(
            f"group {dict(df.dtypes)[group_col]}, state int, init_p double, "
            "mean double, std double, stay_p double, log_lik double, "
            "n_iter int, n_obs long"
        ),
    )


def nmf_topics(
    df: DataFrame,
    group_col: str,
    row_col: str,
    col_col: str,
    value_col: str,
    k: int = 4,
    max_iter: int = 60,
    max_nnz: int = 2_000_000,
) -> DataFrame:
    """Per-group NMF over a sparse (row, col, value) matrix — e.g. topics per
    corpus slice from the (doc, term, tf) matrix. Groups are independent →
    applyInPandas (the reference factors one spectrogram matrix at a time;
    we factor every group's matrix in parallel).

    Output: (group, row_id, topic, weight) — each row's dominant factor
    loading (argmax of W) plus its weight, the engine's topic assignment.

    Scale bound: applyInPandas materializes a whole group in one task, so a
    20 TB source slice would otherwise be a task-OOM. Groups whose nnz
    exceeds ``max_nnz`` are deterministically ROW-sampled BEFORE the group
    shuffle: a row (and all its cells — whole rows, never holes) survives iff
    its xxhash64 bucket falls under max_nnz/nnz, giving an expected-max_nnz
    training sub-matrix that is a pure function of the data. Topics are then
    reported for the sampled rows (fitting on a bounded sample is the
    standard factorization move at scale — the same discipline as the IVF
    coarse-quantizer's bounded trainer sample)."""

    def factorize(pdf: pd.DataFrame) -> pd.DataFrame:
        # canonical triplet order: float accumulation (bincount) order becomes
        # a pure function of the data, not of Spark's partition arrival order —
        # required for bit-stable parity with the single-node oracle referee
        pdf = pdf.sort_values([row_col, col_col]).reset_index(drop=True)
        rows, row_ix = np.unique(pdf[row_col].to_numpy(), return_inverse=True)
        cols, col_ix = np.unique(pdf[col_col].to_numpy(), return_inverse=True)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        kk = min(k, rows.size, cols.size)
        W, _H, _err = nmf_factorize_sparse(
            row_ix, col_ix, vals, rows.size, cols.size, kk, max_iter=max_iter
        )
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

    from pyspark.sql import functions as F

    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_nnz"))
    bounded = df.join(F.broadcast(sizes), group_col)
    keep_frac = F.when(F.col("_nnz") <= max_nnz, F.lit(1.0)).otherwise(
        F.lit(float(max_nnz)) / F.col("_nnz")
    )
    bucket = F.pmod(F.xxhash64(F.col(row_col)), F.lit(1_000_000)) / F.lit(1_000_000.0)
    bounded = bounded.filter(bucket < keep_frac).drop("_nnz")

    row_t = dict(df.dtypes)[row_col]
    return bounded.groupBy(group_col).applyInPandas(
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
