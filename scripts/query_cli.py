#!/usr/bin/env python
"""spark-submit entry point: BM25 top-k query against a built index.

    spark-submit --py-files dist/afspark.zip scripts/query_cli.py \
        --index-dir /data/index --query "hotterm needle" [--k 10]
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from audioflux_spark.operators.wand import bm25_topk_indexed
    from audioflux_spark.sources.segments import IndexReader

    spark = SparkSession.builder.appName("afspark-query").getOrCreate()
    reader = IndexReader(spark, args.index_dir)
    for row in bm25_topk_indexed(reader, args.query, args.k).collect():
        print(f"{row['conv_id']}\t{row['turn_idx']}\t{row['score']:.6f}")
    spark.stop()


if __name__ == "__main__":
    main()
