"""Viterbi operator: distributed result == direct NumPy per sequence; known
planted-path recovery."""

from __future__ import annotations

import numpy as np
import pandas as pd

from audioflux_spark.operators.sequence import GaussianHMM, viterbi_decode, viterbi_path


def test_viterbi_recovers_planted_states():
    rng = np.random.default_rng(5)
    # well-separated emissions → the decoded path equals the planted path
    hmm = GaussianHMM(means=(0.0, 10.0), stds=(1.0, 1.0))
    true = np.repeat([0, 1, 0, 1], 25)
    x = np.where(true == 1, 10.0, 0.0) + rng.normal(0, 0.5, true.size)
    np.testing.assert_array_equal(viterbi_path(x, hmm), true)


def test_distributed_matches_local(spark):
    rng = np.random.default_rng(11)
    rows = []
    for uid in range(20):
        n = int(rng.integers(5, 60))
        vals = rng.normal(rng.integers(0, 2, n).astype(float), 0.8)
        for i, v in enumerate(vals):
            rows.append((uid, i, float(v)))
    pdf = pd.DataFrame(rows, columns=["user_id", "seq", "value"])
    sdf = spark.createDataFrame(pdf).repartition(4)
    got = (
        viterbi_decode(sdf, "user_id", ["seq"], "value")
        .toPandas()
        .sort_values(["user_id", "seq"])
        .reset_index(drop=True)
    )
    hmm = GaussianHMM()
    for uid, grp in pdf.groupby("user_id"):
        grp = grp.sort_values("seq")
        want = viterbi_path(grp["value"].to_numpy(), hmm)
        np.testing.assert_array_equal(
            got[got.user_id == uid]["state"].to_numpy(), want, err_msg=f"user {uid}"
        )
