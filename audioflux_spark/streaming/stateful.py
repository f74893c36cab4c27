"""Custom stateful streaming operator — sessionization with carried state.

The reference's only stateful construct is the isContinue tail-carry
(/root/reference/src/stft_algorithm.c:41,50-51,536-586): bounded per-stream
state carried across chunk boundaries so chunked results equal a one-shot
run. This is the general Spark form of that contract:
``applyInPandasWithState`` holds one bounded state row per group (user),
micro-batches arrive in any chunking, and the emitted sessions are identical
to a batch sessionization of the concatenated input (verified by
tests/test_stateful_stream.py against the batch window-lag query).

Semantics: events within ``gap_s`` of the previous event extend the session;
a larger gap closes the previous session and emits it. Open sessions close
either on state timeout (real deployments) or via ``flush`` events / stream
end handled by the caller; the test drains with availableNow and reads open
sessions from the final state emission.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long, closed boolean"
)
STATE_SCHEMA = "session_start long, last_t long, n_events long"


def _sessionize_group(
    key: Any,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_s: int,
    use_timeout: bool,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # idle user: close and emit the open session
        if state.exists:
            s0, lt, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start": [s0],
                 "session_end": [lt], "n_events": [n], "closed": [True]}
            )
        return

    if state.exists:
        s0, lt, n = state.get
    else:
        s0, lt, n = None, None, 0

    # vectorized gap segmentation: sessions break where the inter-event gap
    # exceeds gap_s; the carried (s0, lt, n) state seeds the first segment so
    # chunked results equal a one-shot run (the tail-carry contract)
    out_rows: list[tuple] = []
    ts = np.sort(
        np.concatenate([p["t"].to_numpy() for p in pdfs]).astype(np.int64)
    )
    if ts.size:
        if lt is None:
            s0, n = int(ts[0]), 0
            prevs = np.concatenate((ts[:1], ts[:-1]))
        else:
            prevs = np.concatenate(([int(lt)], ts[:-1]))
        breaks = np.flatnonzero(ts - prevs > gap_s)
        if breaks.size:
            seg_starts = np.concatenate(([int(s0)], ts[breaks]))
            ends = np.where(breaks > 0, ts[np.maximum(breaks - 1, 0)], int(lt or 0))
            counts = np.diff(np.concatenate(([0], breaks)))
            counts[0] += n
            out_rows = [
                (user_id, int(seg_starts[i]), int(ends[i]), int(counts[i]), True)
                for i in range(breaks.size)
            ]
            s0, n = int(seg_starts[-1]), int(ts.size - breaks[-1])
        else:
            n = int(n + ts.size)
        lt = int(ts[-1])

    state.update((int(s0), int(lt), int(n)))
    if use_timeout:
        state.setTimeoutDuration(gap_s * 1000)
    if out_rows:
        yield pd.DataFrame(
            out_rows,
            columns=["user_id", "session_start", "session_end", "n_events", "closed"],
        )


def sessionize_stream(
    events: DataFrame, gap_s: int = 1800, timeout: bool = True
) -> DataFrame:
    """Streaming sessionization: (user_id, t epoch-seconds) stream → closed
    sessions, one bounded state row per user (the tail-carry analog).

    Requires a STREAMING DataFrame (Spark 4 rejects applyInPandasWithState
    in batch queries); the chunked==one-shot contract is verified by
    comparing the streamed output against an equivalent batch window-lag
    sessionization in tests/test_stateful_stream.py."""
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_s, timeout)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
