"""M5 packaging: the real spark-submit --py-files flow, end to end, from a
directory OUTSIDE the repo (so imports must come from the zip)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_build_and_query(tmp_path, transcripts_pdf):
    data = tmp_path / "data"
    data.mkdir()
    transcripts_pdf.to_parquet(data / "transcripts.parquet", index=False)
    idx = str(tmp_path / "idx")

    zip_out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert zip_out.endswith("afspark.zip") and os.path.exists(zip_out)

    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    env.pop("PYTHONPATH", None)  # imports must resolve via --py-files
    common = [
        "spark-submit", "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_out,
    ]
    build = subprocess.run(
        [*common, os.path.join(REPO, "scripts", "build_index_cli.py"),
         "--input", str(data), "--index-dir", idx, "--partitions", "4"],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert build.returncode == 0, build.stderr[-3000:]
    assert '"n_docs": 5896' in build.stdout

    query = subprocess.run(
        [*common, os.path.join(REPO, "scripts", "query_cli.py"),
         "--index-dir", idx, "--query", "needle_unique_0", "--k", "5"],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert query.returncode == 0, query.stderr[-3000:]
    lines = [l for l in query.stdout.splitlines() if l.startswith("conv-")]
    assert len(lines) == 1 and lines[0].startswith("conv-00000246\t3\t")


@pytest.mark.slow
def test_spark_submit_prep_pipeline(tmp_path):
    """The composed training-data-prep cascade (blocklist → repetition →
    exact dedup → near dedup) through real spark-submit --py-files, reading
    the sf0.001 documents table and writing survivors + a drop-attribution
    summary."""
    import json

    zip_out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    env.pop("PYTHONPATH", None)
    out_dir = str(tmp_path / "clean")
    run = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_out,
         os.path.join(REPO, "scripts", "prep_pipeline_cli.py"),
         "--input", "/root/testdata/sf0.001", "--output", out_dir],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert run.returncode == 0, run.stderr[-3000:]
    stats = json.loads(
        [l for l in run.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert stats["n_input"] == 500
    assert stats["n_kept"] + sum(stats["dropped"].values()) == stats["n_input"]
    assert stats["dropped"]["blocklist"] > 0, "fixture blocklist never fired"
    import duckdb

    n_out = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out_dir}/documents.parquet/*.parquet')"
    ).fetchone()[0]
    assert n_out == stats["n_kept"]
