"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: resumable inverted-index build over the sf0.001
                documents table (adapted to the transcripts shape) + BM25
                top-k via block-max WAND.
queries()     — engine operators from SURVEY.md §2 / §7 over the driver's
                parquet tables (sf_dir argument).
oracle_sql()  — DuckDB twins; fractional values exported as *_e6 integers in
                both engines so value hashes compare exactly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from audioflux_spark import entry_queries as _eq  # noqa: E402

entry = _eq.entry
queries = _eq.queries
oracle_sql = _eq.oracle_sql
