"""Deterministic transcripts + query fixtures (FIXTURES.md F1/F2).

The reference's correctness strategy is bundled fixtures with analytically
known answers — pure 220/880 Hz tones whose spectra are known a priori
(/root/reference/python/audioflux/utils/sample.py:1-31) — plus seeded random
sweeps (/root/reference/benchmark/utils.py:4-6). We adopt both over the
transcript domain: a seeded Zipf corpus with *planted markers* whose top-k
answers are analytically known (a unique needle must be rank 1; a tf-3 vs
tf-1 needle pair must order by tf; 16 identical turns must tie-break by
(conv_id, turn_idx)).

Everything is derived from a single seed; generation is one vectorized NumPy
pass, so the same table is reproduced at any parallelism.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

VOCAB_SIZE = 50_000
ZIPF_S = 1.07
SEED = 42

ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_P = np.array([0.35, 0.45, 0.05, 0.15])
TOOL_NAMES = np.array(
    [
        "bash", "search", "browser", "python", "sql", "editor",
        "calculator", "mail", "calendar", "files", "http", "scheduler",
    ]
)

N_UNIQUE_NEEDLES = 3
N_PAIR_NEEDLES = 2
TIE_BLOCK_SIZE = 16
TIE_TEXT = "tie tie tie"
HOTTERM = "hotterm"
HOTTERM_P = 0.4

SF_TO_NCONVS = {"0.001": 500, "0.01": 5_000, "0.1": 50_000, "0.3": 150_000}


def _zipf_probs(vocab_size: int = VOCAB_SIZE, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    p = 1.0 / ranks**s
    return p / p.sum()


def gen_transcripts(n_convs: int, seed: int = SEED) -> pd.DataFrame:
    """Generate the transcripts table (input_hint schema) as pandas.

    Columns: conv_id str, turn_idx int32, role str, text str, tool str|None,
    ts datetime64[us]. Primary key (conv_id, turn_idx).
    """
    rng = np.random.default_rng(seed)

    lengths = np.clip(1 + rng.poisson(11, n_convs), 1, 64)
    total = int(lengths.sum())
    conv_seq = np.repeat(np.arange(n_convs), lengths)
    turn_idx = np.arange(total) - np.repeat(np.cumsum(lengths) - lengths, lengths)

    role_ix = rng.choice(len(ROLES), size=total, p=ROLE_P)
    roles = ROLES[role_ix]

    n_tokens = rng.integers(5, 121, size=total)
    tok_total = int(n_tokens.sum())
    term_ids = rng.choice(VOCAB_SIZE, size=tok_total, p=_zipf_probs())
    words = np.char.add("term", np.char.zfill(term_ids.astype("U5"), 5))
    bounds = np.cumsum(n_tokens)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(words, bounds)]

    hot_mask = rng.random(total) < HOTTERM_P
    texts = [t + " " + HOTTERM if h else t for t, h in zip(texts, hot_mask)]

    # --- planted markers (override AFTER hotterm so marker rows are exact) ---
    n_special = TIE_BLOCK_SIZE + N_UNIQUE_NEEDLES + 2 * N_PAIR_NEEDLES
    special = rng.choice(total, size=n_special, replace=False)
    pos = 0
    tie_rows = special[pos : pos + TIE_BLOCK_SIZE]
    pos += TIE_BLOCK_SIZE
    for r in tie_rows:
        texts[r] = TIE_TEXT
    for q in range(N_UNIQUE_NEEDLES):
        r = special[pos]
        pos += 1
        texts[r] = texts[r] + f" needle_unique_{q}"
    for q in range(N_PAIR_NEEDLES):
        r3, r1 = special[pos], special[pos + 1]
        pos += 2
        texts[r3] = texts[r3] + f" needle_pair_{q} needle_pair_{q} needle_pair_{q}"
        texts[r1] = texts[r1] + f" needle_pair_{q}"

    tools = np.where(
        roles == "tool", TOOL_NAMES[rng.choice(len(TOOL_NAMES), size=total)], None
    )

    base = np.datetime64("2026-01-01T00:00:00", "us")
    ts = base + conv_seq.astype("timedelta64[m]") + (turn_idx * 7).astype("timedelta64[s]")

    return pd.DataFrame(
        {
            "conv_id": np.char.add("conv-", np.char.zfill(conv_seq.astype("U8"), 8)),
            "turn_idx": turn_idx.astype(np.int32),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


@dataclass(frozen=True)
class Query:
    query_id: str
    query_text: str
    k: int


def gen_queries(transcripts: pd.DataFrame, seed: int = SEED) -> list[Query]:
    """The fixed reference query set (FIXTURES.md F2), derived from the corpus
    so every 'rare'/'mid' term is guaranteed present with known df."""
    from audioflux_spark.functions.analyzer import tokenize_series

    toks = tokenize_series(transcripts["text"])
    df_counts = pd.Series(
        [t for row in toks for t in set(row)], dtype=object
    ).value_counts()
    regular = df_counts[df_counts.index.str.startswith("term")]
    # scale-relative selection: rarest / median-df terms of THIS corpus
    by_df = regular.iloc[np.lexsort((regular.index, regular.to_numpy()))]
    rare = sorted(by_df.index[:3])
    med = float(regular.median())
    dist = (regular - med).abs()
    mids = sorted(regular.iloc[np.lexsort((regular.index, dist.to_numpy()))].index[:5])

    qs: list[Query] = []

    def add(text: str, k: int = 10) -> None:
        qs.append(Query(f"q{len(qs) + 1:03d}", text, k))

    for q in range(2):
        add(f"needle_unique_{q}")                      # rank-1 known a priori
    for t in rare[:3]:
        add(t)
    for t in mids:
        add(t)
    add(HOTTERM)
    add(HOTTERM, k=1)
    add(HOTTERM, k=100)
    add(f"{rare[0]} {HOTTERM}")                        # rare + hot conjunction
    add(f"{mids[0]} {mids[1]}")
    add(f"{mids[2]} {mids[3]}")
    add(f"needle_pair_0")
    add(f"needle_pair_1 {HOTTERM}")
    add(f"{mids[0]} {mids[1]} {mids[2]}")
    add(f"{rare[1]} {mids[4]} {HOTTERM}")
    add(f"{rare[2]} {mids[0]} {mids[1]}")
    add(f"zzqx_absent_term {mids[0]}")                 # one absent term
    add("zzqx_absent_term zzqx_also_absent")           # all absent → empty
    add("tie")                                         # tie block
    return qs


def fixture_dir(sf: str, root: str | None = None) -> str:
    """Materialize (once) and return the parquet dir for a given SF tier."""
    root = root or os.environ.get("AFSPARK_FIXTURES", "/tmp/afspark_fixtures")
    out = os.path.join(root, f"sf{sf}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        pdf = gen_transcripts(SF_TO_NCONVS[sf])
        # small row groups so Spark scan splits parallelize (a single-row-
        # group file serializes the whole read into one task)
        pdf.to_parquet(
            os.path.join(out, "transcripts.parquet"), index=False,
            row_group_size=20_000,
        )
        with open(marker, "w") as f:
            f.write("ok")
    return out
