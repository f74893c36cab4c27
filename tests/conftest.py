from __future__ import annotations

import pandas as pd
import pytest

from audioflux_spark.fixtures import SF_TO_NCONVS, gen_queries, gen_transcripts
from audioflux_spark.oracle import BM25Oracle
from audioflux_spark.plans.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("afspark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pdf() -> pd.DataFrame:
    return gen_transcripts(SF_TO_NCONVS["0.001"])


@pytest.fixture(scope="session")
def transcripts_sdf(spark, transcripts_pdf):
    # read from the parquet fixture (NOT createDataFrame + repartition): a
    # deterministic scan gives deterministic range-partition sampling, which
    # the resume byte-identity guarantee is conditioned on — arbitrary
    # shuffled inputs have nondeterministic row order across runs and fall
    # back to fingerprint-mismatch full rebuild (safe, not byte-stable).
    from audioflux_spark.fixtures import fixture_dir

    df = spark.read.parquet(fixture_dir("0.001") + "/transcripts.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def oracle(transcripts_pdf) -> BM25Oracle:
    return BM25Oracle(transcripts_pdf)


@pytest.fixture(scope="session")
def queries(transcripts_pdf):
    return gen_queries(transcripts_pdf)
