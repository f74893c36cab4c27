"""Custom stateful streaming operator (applyInPandasWithState): chunked
stream sessionization must equal a one-shot batch run — the isContinue
tail-carry contract (results independent of chunk boundaries)."""

from __future__ import annotations

import time

import numpy as np
import pandas as pd

from audioflux_spark.streaming.stateful import sessionize_stream

GAP = 1800


def _ground_truth(pdf: pd.DataFrame) -> list[tuple]:
    """(user_id, start, end, n) for every session, in order."""
    out = []
    for uid, g in pdf.sort_values(["user_id", "t"]).groupby("user_id"):
        ts = g["t"].to_numpy()
        s0, lt, n = None, None, 0
        for t in ts:
            t = int(t)
            if lt is not None and t - lt > GAP:
                out.append((uid, s0, lt, n))
                s0, n = None, 0
            if s0 is None:
                s0 = t
            lt = t
            n += 1
        out.append((uid, s0, lt, n))
    return out


def test_stateful_stream_equals_batch(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("stream_src")
    ck = str(tmp_path_factory.mktemp("stream_ck"))

    rng = np.random.default_rng(17)
    rows = []
    for uid in range(5):
        t = 1_700_000_000
        for _ in range(60):
            t += int(rng.integers(60, 4000))  # mix of intra- and cross-gap steps
            rows.append((uid, t))
    pdf = pd.DataFrame(rows, columns=["user_id", "t"])

    # time-ordered chunks with increasing mtimes → micro-batches arrive in
    # event order (a watermarked real deployment guarantees the same)
    chunks = np.array_split(pdf.sort_values("t").reset_index(drop=True), 4)
    for i, ch in enumerate(chunks):
        ch.to_parquet(str(src / f"part{i:02d}.parquet"))
        time.sleep(0.05)

    stream = (
        spark.readStream.schema("user_id long, t long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        sessionize_stream(stream, gap_s=GAP, timeout=False)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.table("sess_out").toPandas()
    assert (got["closed"] == True).all()  # noqa: E712 — only closed sessions emit

    want_all = _ground_truth(pdf)
    # every session except each user's LAST (still open, NoTimeout) must emit
    want_closed = set()
    by_user: dict[int, list[tuple]] = {}
    for s in want_all:
        by_user.setdefault(s[0], []).append(s)
    for uid, sess in by_user.items():
        want_closed.update(sess[:-1])
    got_set = {
        (int(r.user_id), int(r.session_start), int(r.session_end), int(r.n_events))
        for r in got.itertuples()
    }
    assert got_set == want_closed
    # sanity: the fixture actually produced multi-session users
    assert len(want_closed) >= 5
