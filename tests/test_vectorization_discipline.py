"""Lint-style guard (SURVEY §7.3 item 4): no per-row Python in kernels.

The input_hint mandates vectorized Arrow/pandas UDFs with no per-row Python.
This test greps the package source for the row-at-a-time escape hatches:
``Series.apply``/``DataFrame.apply`` with callables, ``iterrows``,
``itertuples``, and pyspark's row-at-a-time ``F.udf``.
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "audioflux_spark"

FORBIDDEN = [
    (re.compile(r"\.apply\s*\(\s*lambda"), ".apply(lambda ...) — per-row Python"),
    (re.compile(r"\.iterrows\s*\("), ".iterrows() — per-row Python"),
    (re.compile(r"\.itertuples\s*\("), ".itertuples() — per-row Python"),
    (re.compile(r"\bF\.udf\s*\("), "F.udf — row-at-a-time pyspark UDF"),
    (re.compile(r"@udf\b"), "@udf — row-at-a-time pyspark UDF"),
    # .iloc[i] / .iloc[ri] style per-row extraction inside a Python loop;
    # constant .iloc[0] (scalar broadcast) and array-index .iloc[np.lexsort]
    # (vectorized fancy indexing) remain allowed
    (re.compile(r"\.iloc\[\s*[A-Za-z_]\w*\s*\]"),
     ".iloc[<var>] — per-row extraction loop"),
]


def test_no_row_at_a_time_python():
    offenders = []
    for path in PKG.rglob("*.py"):
        text = path.read_text()
        for pattern, why in FORBIDDEN:
            for m in pattern.finditer(text):
                line = text[: m.start()].count("\n") + 1
                offenders.append(f"{path.relative_to(PKG.parent)}:{line}: {why}")
    assert not offenders, "row-at-a-time Python found:\n" + "\n".join(offenders)
