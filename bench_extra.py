#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is FROZEN for the
driver; this file holds the extra instrumentation the optimization round
needs — per-query isolation, explain capture, build phase profile).

Methodology mirrors bench.py exactly where it overlaps (same session shape,
same warm-up-then-time discipline, same .collect() endpoint the frozen bench
times), plus:

  * --explain DIR      write .explain("formatted") per query to DIR
  * --repeats N        timed repeats per query (reports min + all samples)
  * --queries a,b,c    subset (default: the 12 driver-table bench queries)
  * --probe            disclose the 4-way ALU host probe around the run
  * --noop             time df.write.format("noop") instead of .collect()
                       (guide §1.4 — isolates compute from driver transfer)

Usage: python bench_extra.py [--explain plans/r06 --suffix _before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "term_doc_freqs", "dedup_shingle_jaccard", "dedup_lsh_pairs",
    "dedup_minhash", "dedup_embedding_pairs", "ann_topk_cosine",
    "events_sessionize", "events_scalogram", "term_entropy",
    "doc_hps", "doc_pack_windows", "doc_stratified_sample",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--explain", type=str, default="")
    ap.add_argument("--suffix", type=str, default="")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--queries", type=str, default="")
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    from audioflux_spark import get_spark
    import audioflux_spark.entry_queries as eq

    names = args.queries.split(",") if args.queries else BENCH_QUERIES
    out: dict = {"sf_dir": SF_DIR, "cores": CPUS, "endpoint":
                 "noop" if args.noop else "collect"}
    if args.probe:
        from bench import probe_ratio
        out["probe_before"] = round(probe_ratio(4), 3)

    spark = get_spark("bench-extra", cores=CPUS, shuffle_partitions=CPUS)
    reg = eq.queries()
    samples: dict[str, list[float]] = {}
    for name in names:
        fn = reg[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, SF_DIR).collect()  # warm-up, identical to bench.py
        if args.explain:
            import io
            from contextlib import redirect_stdout

            os.makedirs(args.explain, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, SF_DIR).explain("formatted")
            with open(
                os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
        runs = []
        for r in range(args.repeats):
            spark.sparkContext.setJobDescription(f"timed:{name}:{r}")
            df = fn(spark, SF_DIR)
            t0 = time.perf_counter()
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            runs.append(round(time.perf_counter() - t0, 4))
        samples[name] = runs
    spark.stop()
    if args.probe:
        from bench import probe_ratio
        out["probe_after"] = round(probe_ratio(4), 3)
    out["queries_min"] = {n: min(v) for n, v in samples.items()}
    out["queries_samples"] = samples
    out["total_min_sec"] = round(sum(out["queries_min"].values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
