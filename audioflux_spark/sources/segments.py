"""IndexReader — opens a built index directory for querying.

Analog of the reference's opaque operator handle holding precomputed state
(/root/reference/python/audioflux/base.py:4-8): meta + segment/docstore
DataFrames bound once, reused across queries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from audioflux_spark.operators.indexer import IndexMeta


class IndexReader:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = IndexMeta.from_json(f.read())
        # bind once (operator-handle semantics): stable DataFrame instances
        # whose columns can be referenced across calls
        #: merged term → postings blobs, range-partitioned + sorted by term,
        #: so a `term IN (...)` filter prunes parquet row groups via min/max
        self.segments: DataFrame = spark.read.parquet(
            os.path.join(index_dir, "segments")
        )
        self.docstore: DataFrame = spark.read.parquet(
            os.path.join(index_dir, "docstore")
        )
