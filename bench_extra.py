#!/usr/bin/env python
"""Round-6 optimization harness: per-query isolation + plan capture.

NOT the driver bench (bench.py is frozen for measurement). This file:

* times individual queries with the SAME consume semantics as bench.py
  (xxhash64 agg over every column) plus an optional noop sink, so numbers
  are comparable to BENCH_r05.json rows;
* writes `.explain("formatted")` output to plans/r06/<query>_<tag>.txt for
  the before/after evidence the optimization round requires;
* labels jobs via setJobDescription (guide §1.5).

Usage:
  python bench_extra.py --queries q_minhash_lsh_pairs q_dedup_clusters \
      --sf /root/testdata/sf0.1 --reps 2 --tag before --plans
  python bench_extra.py --all --tag after
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")

DEFAULT_QUERIES = [
    # headline
    "q1_pricing_summary", "q3_shipping_priority", "q5_nation_revenue",
    "q_running_total", "q_strip_regularize", "q_token_count",
    "q_exact_dedup", "q_minhash_lsh_pairs", "q_dedup_clusters",
    "q_simhash", "q_ngram_jaccard_pairs", "q_ann_cosine_topk",
    "q_ann_ivf_topk", "q_embedding_neardup_lsh", "q_cer_eval",
    "q_cer_histogram",
    # extraction
    "x_extract_docs", "x_image_stats",
    # graph / pipeline sections
    "q_pagerank", "q_incremental_dedup", "q_mixture_sample",
    "q_gopher_rules", "q_exact_substring", "q_url_dedup",
    "q_bpe_pair_counts",
]


def _consume(df) -> None:
    from pyspark.sql import functions as F

    df.agg(F.bit_xor(F.xxhash64(*df.columns))).collect()


def _release(spark) -> None:
    gc.collect()
    try:
        sc = spark.sparkContext
        leftovers = sc._jvm.scala.collection.JavaConverters.mapAsJavaMapConverter(
            sc._jsc.sc().getPersistentRDDs()
        ).asJava()
        for rdd in leftovers.values():
            rdd.unpersist(False)
        sc._jvm.System.gc()
    except Exception:
        pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tag", default=None, help="also write plans/r06/<q>_<tag>.txt")
    ap.add_argument("--noop", action="store_true", help="use noop sink instead of hash agg")
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    names = args.queries if args.queries else DEFAULT_QUERIES

    from calamari_spark.plans.registry import QUERIES, SHADOW_QUERIES
    from calamari_spark.session import get_spark

    lookup = {**SHADOW_QUERIES, **QUERIES}
    spark = get_spark("bench_extra", cores=args.cores)
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).count()
    from calamari_spark.plans.extraction import load_interleaved

    load_interleaved(spark, args.sf)

    os.makedirs(PLAN_DIR, exist_ok=True)
    out = {}
    for name in names:
        if name not in lookup:
            continue
        fn, _ = lookup[name]
        if args.tag:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLAN_DIR, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
            del df
            _release(spark)
        best, samples = None, []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                _consume(df)
            dt = time.perf_counter() - t0
            samples.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(None)
            del df
            _release(spark)
        out[name] = {"min": round(best, 3), "samples": samples}
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf": args.sf, "cores": args.cores, "noop": args.noop,
                      "queries": out}))


if __name__ == "__main__":
    main()
