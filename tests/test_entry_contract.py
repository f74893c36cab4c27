"""Driver-contract rehearsal: run each __spark_entry__.queries() entry on
Spark and its oracle_sql() twin on DuckDB at sf0.01; compare row count,
column names, and order-insensitive values — the driver's own gate."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return (
        pdf.sort_values(list(pdf.columns))
        .reset_index(drop=True)
        .astype(str)
    )


ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sqls = entry_mod.oracle_sql()
    if name not in sqls:
        # non-SQL-expressible op: the driver records a rows-only check
        got = q(spark, SF_DIR).toPandas()
        assert len(got) >= 0 and len(got.columns) > 0
        return
    got = q(spark, SF_DIR).toPandas()
    want = duck.sql(sqls[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    g, w = _normalize(got), _normalize(want)
    mism = (g != w).any(axis=1)
    assert not mism.any(), (
        f"{name}: value mismatch\n{g[mism].head()}\nvs\n{w[mism].head()}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score_e6"]


def test_driver_window_composition():
    """The driver's correctness harness samples only the FIRST 50 queries()
    entries (discovered round 3: 15 new queries silently lost coverage).
    Guard the invariant: every entry has an oracle, and every query added
    or changed in the current round sits inside the 50-entry window."""
    qs = list(entry_mod.queries())
    osql = entry_mod.oracle_sql()
    missing = [q for q in qs if q not in osql]
    assert not missing, f"entries without an oracle twin: {missing}"
    window = set(qs[:50])
    round4_new_or_changed = {
        # round-3 transforms that had never been driver-sampled
        "events_dct", "events_goertzel", "events_czt", "events_stransform",
        "events_hilbert", "events_reassign", "events_scalogram",
        "events_cepstrogram", "doc_tristimulus", "doc_hps",
        "doc_envelope_residue", "doc_cepstrum", "doc_rolloff",
        "events_yin_trough", "events_hourly_entropy",
        # round-4 additions / changed paths
        "events_synsq", "events_ncf_pitch", "events_wpt_rollup",
        "events_swt", "events_stft_pitch", "events_pef_pitch",
        "doc_pack_windows", "doc_stratified_sample",
        "bm25_topk_phrase", "dedup_embedding_pairs",
    }
    out = round4_new_or_changed - window
    assert not out, f"round-4-critical queries outside the driver window: {out}"
