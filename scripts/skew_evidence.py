#!/usr/bin/env python
"""Per-partition skew evidence for the salted reassembly (BASELINE.md
protocol step 4): on the skew-tail corpus (~1% of docs carry 500-2000
spans vs ~10 normal), compare the reduce-side partition row distribution
and the reassembly wall clock WITHOUT salting (n_salt=1: every span of a
document lands on one reducer) and WITH the two-level salt (n_salt=8).

Prints a markdown table for BASELINE.md. Run on an idle box:

    python scripts/skew_evidence.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_PART = 32


def partition_stats(spans, keys, n_part=N_PART):
    from pyspark.sql import functions as F

    counts = (
        spans.repartition(n_part, *keys)
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    rows = sorted(r["count"] for r in counts)
    return {
        "partitions": len(rows),
        "min": rows[0],
        "p50": rows[len(rows) // 2],
        "max": rows[-1],
        "max/p50": round(rows[-1] / max(rows[len(rows) // 2], 1), 2),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from calamari_spark.plans.extraction import (
        explode_spans,
        load_interleaved,
        reassemble_spans,
    )
    from calamari_spark.session import get_spark

    spark = get_spark("skew_evidence")
    docs, _ = load_interleaved(spark, sf_dir)
    spans = explode_spans(docs).filter(F.col("kind").isNotNull())
    spans = spans.localCheckpoint()  # isolate the measurement from the scan
    n = spans.count()

    results = {}
    for label, keys, n_salt in (
        ("unsalted", ["doc_id"], 1),
        ("salted (n_salt=8)", ["doc_id", "salt"], 8),
    ):
        keyed = spans.withColumn("salt", F.pmod(F.col("offset"), F.lit(n_salt)))
        stats = partition_stats(keyed, keys)
        # steady-state reassembly wall clock at this salt level
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            reassemble_spans(spans, n_salt=n_salt).agg(
                F.bit_xor(F.xxhash64("doc_id"))
            ).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        stats["reassembly_s"] = round(best, 3)
        results[label] = stats

    print(f"\ncorpus: {sf_dir} ({n} routed spans, {N_PART} reduce partitions)\n")
    cols = ["min", "p50", "max", "max/p50", "reassembly_s"]
    print("| level-1 grouping | " + " | ".join(cols) + " |")
    print("|---|" + "---|" * len(cols))
    for label, s in results.items():
        print("| " + label + " | " + " | ".join(str(s[c]) for c in cols) + " |")


if __name__ == "__main__":
    main()
