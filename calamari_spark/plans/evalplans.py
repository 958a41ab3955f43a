"""Evaluation/reporting queries (SURVEY.md §2.G).

The evaluator's join + per-line scoring + fold-to-totals shape is
q_cer_eval (textplans); here are the remaining reference reports:
worst-lines top-k (reference: calamari_ocr/scripts/eval.py:37-49),
synchronize-based confusion counts + top-N (evaluator.py:119-203,
scripts/eval.py:17-34), dataset statistics (scripts/dataset_statistics.py),
and average prediction confidence
(scripts/compute_average_prediction_confidence.py:21-27).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calamari_spark.plans.textplans import _REG_SQL, _regularized_col
from calamari_spark.sources.tables import load_table

TOP_N = 10


def _gt_pred(docs: DataFrame):
    """The synthetic evaluation scenario shared with q_cer_eval: pred is a
    seeded deterministic corruption of gt (drop 'a', 'o' -> '0')."""
    clean = _regularized_col(F.col("text"))
    gt = clean
    pred = F.replace(F.replace(clean, F.lit("a"), F.lit("")), F.lit("o"), F.lit("0"))
    return docs.select("doc_id", gt.alias("gt"), pred.alias("pred"))


def q_worst_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines sorted by error count, top N (reference: eval.py:37-49)."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        _gt_pred(docs)
        .select(
            "doc_id",
            F.length("gt").alias("chars"),
            F.levenshtein("gt", "pred").alias("errs"),
        )
        .orderBy(F.desc("errs"), "doc_id")
        .limit(TOP_N)
    )


Q_WORST_SQL = f"""
SELECT doc_id, length(gt) AS chars, levenshtein(gt, pred) AS errs
FROM (
  SELECT doc_id, {_REG_SQL} AS gt,
         replace(replace({_REG_SQL}, 'a', ''), 'o', '0') AS pred
  FROM documents
)
ORDER BY errs DESC, doc_id LIMIT {TOP_N}
"""


def x_confusions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N confusion counts from synchronize-based alignment — the
    reference's confusion report (evaluator.py:152-160: per mismatched sync
    region, (gt_sub, pred_sub) += 1; eval.py:17-34: sort desc, take N).
    The recursive LCS alignment has no SQL formula, but the output is a
    pure function of the corpus (deterministic corruption, integer counts,
    full deterministic tie order): oracled against the committed golden
    fixture (plans/golden.py)."""
    docs = load_table(spark, "documents", sf_dir)
    pairs = _gt_pred(docs)

    schema = "gt_sub string, pred_sub string, n int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from calamari_spark.operators.synchronize import synchronize

        for b in batches:
            rows = []
            for gt, pred in zip(b["gt"], b["pred"]):
                for seg in synchronize([gt, pred]):
                    a = gt[seg.starts[0] : seg.stops[0] + 1]
                    p = pred[seg.starts[1] : seg.stops[1] + 1]
                    if a != p:
                        rows.append({"gt_sub": a, "pred_sub": p, "n": 1})
            yield pd.DataFrame(rows, columns=["gt_sub", "pred_sub", "n"])

    confusions = pairs.mapInPandas(run, schema=schema)
    return (
        confusions.groupBy("gt_sub", "pred_sub")
        .agg(F.sum("n").alias("count"))
        .orderBy(F.desc("count"), "gt_sub", "pred_sub")
        .limit(TOP_N)
    )


def x_dataset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-image corpus statistics (reference: dataset_statistics.py:27-88)
    — count + width moments verified against the fixture's stored dims —
    PLUS the transcript codec construction (reference: codec.py:65-106,
    compute_codec over the gt texts; q_distinct_chars' distinct-explode
    merged here as the sorted charset string — dataset statistics and codec
    build run over the same corpus pass in the reference's workflow too).
    Both aggregates are one-row; the charset side broadcasts."""
    from calamari_spark.plans.extraction import load_interleaved

    _, media = load_interleaved(spark, sf_dir)
    stats = media.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("width").alias("min_width"),
        F.max("width").alias("max_width"),
        F.round(F.avg("width"), 6).alias("avg_width"),
        F.round(F.stddev_samp("width"), 6).alias("std_width"),
    )
    charset = (
        media.select(F.explode(F.split("gt", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .agg(F.array_join(F.array_sort(F.collect_set("ch")), "").alias("charset"))
    )
    return stats.crossJoin(F.broadcast(charset)).withColumn(
        "n_codec_chars", F.length("charset")
    )


def x_dataset_stats_oracle(sf_dir: str) -> str:
    from calamari_spark.plans.extraction import _fixture_glob

    media = _fixture_glob(sf_dir, "line_images")
    return f"""
WITH codec AS (
  SELECT string_agg(ch, '' ORDER BY ch) AS charset
  FROM (SELECT DISTINCT unnest(string_split(gt, '')) AS ch
        FROM read_parquet('{media}')) t
  WHERE ch != ''
)
SELECT count(*) AS n_lines,
       min(width) AS min_width,
       max(width) AS max_width,
       round(avg(width), 6) AS avg_width,
       round(stddev_samp(width), 6) AS std_width,
       (SELECT charset FROM codec) AS charset,
       (SELECT CAST(length(charset) AS INTEGER) FROM codec) AS n_codec_chars
FROM read_parquet('{media}')
"""


def q_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The xlsx per-line sheet's SQL-expressible columns (reference:
    scripts/eval.py:64-94: GT, PRED, LEN, ERR, CER = errs/max(len gt, len
    pred, 1), REL. ERR = errs/total_char_errs). The one-row global total
    broadcasts; everything else is a pure map."""
    docs = load_table(spark, "documents", sf_dir)
    from calamari_spark.plans.common import fan_out, materialize

    # referenced by BOTH the global-total agg and the main select, and the
    # levenshtein map is the expensive half (see materialize); fan_out pins
    # the kernel's parallelism (single-file scan = one partition otherwise)
    per_line = materialize(
        fan_out(_gt_pred(docs), "doc_id").select(
            "doc_id",
            "gt",
            "pred",
            F.length("gt").alias("len"),
            F.levenshtein("gt", "pred").alias("err"),
        )
    )
    total = per_line.agg(F.sum("err").alias("total_err"))
    return (
        per_line.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "gt",
            "pred",
            "len",
            "err",
            F.round(
                F.col("err") / F.greatest(F.length("gt"), F.length("pred"), F.lit(1)), 6
            ).alias("cer"),
            F.round(
                F.when(F.col("total_err") > 0, F.col("err") / F.col("total_err")).otherwise(0.0), 6
            ).alias("rel_err"),
        )
        .orderBy(F.desc("err"), "doc_id")
    )


Q_EVAL_REPORT_SQL = f"""
WITH per_line AS (
  SELECT doc_id, gt, pred, length(gt) AS len, levenshtein(gt, pred) AS err
  FROM (
    SELECT doc_id, {_REG_SQL} AS gt,
           replace(replace({_REG_SQL}, 'a', ''), 'o', '0') AS pred
    FROM documents
  )
)
SELECT doc_id, gt, pred, len, err,
       round(CAST(err AS DOUBLE) / greatest(length(gt), length(pred), 1), 6) AS cer,
       round(CASE WHEN t.total_err > 0 THEN CAST(err AS DOUBLE) / t.total_err ELSE 0.0 END, 6) AS rel_err
FROM per_line, (SELECT sum(err) AS total_err FROM per_line) t
ORDER BY err DESC, doc_id
"""


def write_eval_report(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    """The reference's xlsx evaluation workbook (scripts/eval.py:52-135) as
    three CSV sheets (xlsxwriter is absent in this container; columns and
    sort orders match the reference sheets):

    * ``per_line/``  — GT FILE,GT,PRED,LEN,ERR,CER,REL. ERR (+SYNC ERR and
      CONFUSIONS via the synchronize pass), sorted worst-first;
    * ``confusions/`` — GT,PRED,COUNT over the whole corpus, sorted desc;
    * ``histogram/``  — CER bucket,Count (q_cer_histogram's buckets).
    """
    import os

    per_line = q_eval_report(spark, sf_dir)
    per_line.write.mode("overwrite").option("header", True).csv(
        os.path.join(out_dir, "per_line")
    )
    confusions = x_confusions(spark, sf_dir)
    confusions.write.mode("overwrite").option("header", True).csv(
        os.path.join(out_dir, "confusions")
    )
    hist = q_cer_histogram(spark, sf_dir)
    hist.write.mode("overwrite").option("header", True).csv(
        os.path.join(out_dir, "histogram")
    )
    return {"sheets": ["per_line", "confusions", "histogram"], "out_dir": out_dir}


CER_BIN = 0.05  # histogram bin width (reference: scripts/eval.py:52-135)


def q_cer_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-line CER histogram (reference: scripts/eval.py:52-135 renders a
    matplotlib histogram; the aggregation itself is floor(ler/bin) groupBy).
    One partial-aggregated shuffle on the bucket key — scale-safe.

    The per-bucket average is the MICRO average round(sum(errs)/sum(chars))
    built from exact integer partial sums, not avg(ler): a float64 mean of
    per-line ratios is partition-order-dependent under Spark's partial
    aggregation and can flip a round(...,6) boundary vs DuckDB's sequential
    sum (the repo's cross-engine FP rule); integer sums are order-exact."""
    docs = load_table(spark, "documents", sf_dir)
    from calamari_spark.plans.common import fan_out

    # pin the levenshtein map's parallelism (see fan_out: a single-file
    # scan otherwise runs the whole kernel on one core)
    per_line = fan_out(_gt_pred(docs), "doc_id").select(
        F.length("gt").alias("chars"),
        F.levenshtein("gt", "pred").alias("errs"),
    )
    # bucket from the per-line ratio: one float64 division + one floor per
    # row, bit-identical across engines (no summation involved)
    return (
        per_line.withColumn(
            "bucket", F.floor((F.col("errs") / F.col("chars")) / CER_BIN).cast("int")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("errs") / F.sum("chars"), 6).alias("bucket_cer"),
        )
        .withColumn("bucket_lo", F.round(F.col("bucket") * CER_BIN, 2))
        .select("bucket", "bucket_lo", "n_lines", "bucket_cer")
        .orderBy("bucket")
    )


Q_CER_HIST_SQL = f"""
SELECT bucket,
       round(bucket * {CER_BIN}, 2) AS bucket_lo,
       count(*) AS n_lines,
       round(CAST(sum(errs) AS DOUBLE) / sum(chars), 6) AS bucket_cer
FROM (
  SELECT CAST(floor((CAST(errs AS DOUBLE) / chars) / {CER_BIN}) AS INTEGER) AS bucket,
         chars, errs
  FROM (
    SELECT length(gt) AS chars, levenshtein(gt, pred) AS errs
    FROM (
      SELECT {_REG_SQL} AS gt,
             replace(replace({_REG_SQL}, 'a', ''), 'o', '0') AS pred
      FROM documents
    )
  )
)
GROUP BY bucket ORDER BY bucket
"""


def x_avg_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean sentence confidence over the recognize output (reference:
    scripts/predict.py:177-178). Confidence comes from the voter internals
    (per-line deterministic floats); the MEAN is computed from exact
    integer-quantized partial sums — floor(p * 1e9) per line, summed as
    decimal(38,0) (exact 128-bit integer arithmetic; int64 would wrap
    silently past ~9.2e9 lines, decimal holds ~1e29 lines at this
    quantum) — so the result is identical under any partition order (the
    repo's cross-engine FP rule) and the committed golden fixture is a
    stable oracle. Quantization bias < 1e-9, below the 6-dp rounding."""
    from calamari_spark.plans.extraction import _recognized_with_positions

    rec = _recognized_with_positions(spark, sf_dir)
    q = F.floor(F.col("avg_char_probability") * 1e9).cast("decimal(38,0)")
    return rec.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(q) / (F.count(F.lit(1)) * 1e9), 6).alias("avg_confidence"),
    )


def _sfq(fn, oracle_fn=None):
    if oracle_fn is None:
        return (fn, None)
    return (fn, oracle_fn("/root/testdata/sf0.01"))


def _golden(name):
    from calamari_spark.plans.golden import golden_oracle

    return golden_oracle(name)


EVAL_QUERIES = {
    "q_cer_histogram": (q_cer_histogram, Q_CER_HIST_SQL),
    "q_eval_report": (q_eval_report, Q_EVAL_REPORT_SQL),
    "x_confusions": (x_confusions, _golden("x_confusions")),
    "x_dataset_stats": _sfq(x_dataset_stats, x_dataset_stats_oracle),
    "x_avg_confidence": (x_avg_confidence, _golden("x_avg_confidence")),
}

# q_worst_lines is q_eval_report's ordering with fewer columns + LIMIT —
# subsumed for driver purposes (50-row window), still pytest-verified
EVAL_SHADOW_QUERIES = {
    "q_worst_lines": (q_worst_lines, Q_WORST_SQL),
}
