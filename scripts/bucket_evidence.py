#!/usr/bin/env python
"""Width-bucketing A/B for the CNN inference path (SURVEY §4's length
bucketing; reference: bucket_boundaries batching, data.py:88-92).

The inference kernel already forwards per padded-length GROUP inside each
Arrow batch (batch composition can never change a line's numbers — the
x_extract_cnn golden-fixture requirement), so what `sortWithinPartitions
("width")` buys is GROUP SIZE: sorted batches hold few distinct widths and
run few big GEMMs; unsorted batches shatter into many one-line groups.

Two measurements on the real corpus width distribution:

1. batching stats per variant — groups per batch, mean group size, and the
   padding waste a NAIVE batch-level max-pad would have paid (the cost the
   reference's bucketing avoids; our grouping caps waste at <4 frames/line
   regardless, also reported);
2. wall clock of the full CNN query, sorted vs unsorted.

Prints a markdown table for BASELINE.md. Run on an idle box:

    python scripts/bucket_evidence.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def batch_stats(with_png, sort: bool):
    """Per-Arrow-batch padding/grouping statistics for one variant."""
    import pandas as pd
    from pyspark.sql import functions as F

    n_part = with_png.sparkSession.sparkContext.defaultParallelism * 2
    df = with_png.repartition(n_part, "media_ref")
    if sort:
        df = df.sortWithinPartitions("width")

    schema = (
        "n_lines long, n_groups long, real_frames long, grouped_frames long,"
        " naive_frames long"
    )

    def run(batches):
        for b in batches:
            t_pads = [-(-int(w) // 4) * 4 for w in b["width"]]
            if not t_pads:
                continue
            groups = {}
            for t in t_pads:
                groups[t] = groups.get(t, 0) + 1
            yield pd.DataFrame(
                [
                    {
                        "n_lines": len(t_pads),
                        "n_groups": len(groups),
                        "real_frames": int(sum(int(w) for w in b["width"])),
                        "grouped_frames": int(sum(t * c for t, c in groups.items())),
                        "naive_frames": int(max(t_pads) * len(t_pads)),
                    }
                ]
            )

    agg = (
        df.select("media_ref", "width")
        .mapInPandas(run, schema)
        .agg(
            F.sum("n_lines").alias("lines"),
            F.sum("n_groups").alias("groups"),
            F.sum("real_frames").alias("real"),
            F.sum("grouped_frames").alias("grouped"),
            F.sum("naive_frames").alias("naive"),
        )
        .first()
    )
    return {
        "lines": agg["lines"],
        "groups": agg["groups"],
        "mean_group_size": round(agg["lines"] / agg["groups"], 1),
        "grouped_pad_pct": round(100 * (agg["grouped"] / agg["real"] - 1), 2),
        "naive_pad_pct": round(100 * (agg["naive"] / agg["real"] - 1), 2),
    }


def timed_cnn(spark, sf_dir: str, sort: bool, reps: int = 2) -> float:
    """Wall clock of x_extract_cnn with the sort toggled via monkeypatch-
    free plan rebuild (the query body is re-declared here with the one
    line changed; keep in sync with extraction.x_extract_cnn)."""
    import calamari_spark.plans.extraction as ex
    from pyspark.sql import functions as F

    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        if sort:
            df = ex.x_extract_cnn(spark, sf_dir)
        else:
            # identical plan minus sortWithinPartitions: reuse the public
            # query then strip the sort by rebuilding the source
            docs, media = ex.load_interleaved(spark, sf_dir)
            spans = (
                ex.explode_spans(docs)
                .filter(F.col("kind") == "media")
                .select("media_ref")
            )
            with_png = spans.join(
                media.select("media_ref", "png", "width"), "media_ref"
            )
            n_part = spark.sparkContext.defaultParallelism * 2
            with_png = with_png.repartition(n_part, "media_ref")
            df = ex._extract_cnn_over(with_png).orderBy("media_ref")
        df.agg(F.bit_xor(F.xxhash64(*df.columns))).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from calamari_spark.plans.extraction import explode_spans, load_interleaved
    from calamari_spark.session import get_spark

    spark = get_spark("bucket_evidence")
    docs, media = load_interleaved(spark, sf_dir)
    spans = explode_spans(docs).filter(F.col("kind") == "media").select("media_ref")
    with_png = spans.join(
        media.select("media_ref", "png", "width"), "media_ref"
    ).localCheckpoint()

    # Two Arrow-batch regimes:
    # * default (10k rows/batch): at this SF every partition fits in ONE
    #   batch, so the sort cannot change batch composition — it documents
    #   that the KERNEL's per-length grouping alone caps padding waste;
    # * batch=32: partitions >> batch size, the 100 TB regime (real
    #   partitions hold ~10^5 lines vs 10^4-row batches) — here the sort
    #   decides whether a batch holds 1 width or 30.
    rows = []
    for batch_size in (None, 32):
        if batch_size:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", batch_size)
        for sort in (False, True):
            s = batch_stats(with_png, sort)
            t = timed_cnn(spark, sf_dir, sort)
            regime = f"batch={batch_size or 'default'}"
            rows.append((regime, ("sorted" if sort else "unsorted"), s, t))
    spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")

    print("| regime | variant | lines | GEMM groups | mean group | grouped pad % | naive pad % | CNN wall (s) |")
    print("|---|---|---|---|---|---|---|---|")
    for regime, name, s, t in rows:
        print(
            f"| {regime} | {name} | {s['lines']} | {s['groups']} | {s['mean_group_size']} "
            f"| {s['grouped_pad_pct']} | {s['naive_pad_pct']} | {t} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
