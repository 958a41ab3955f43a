"""Structured Streaming ingestion for the extraction pipeline.

The reference is batch-only (SURVEY.md §2.H: its closest analogs are
on-the-fly generation, reference: calamari_ocr/ocr/dataset/datareader/
base.py:57-63, and the queue-style raw predictor, docs/source/
doc.predicting.rst:36-50). This module is the Spark-native stretch the
north star's continuous-corpus setting implies: newly landed document
files are discovered by a file-source stream and flow through the SAME
``extract_documents`` plan per micro-batch (foreachBatch). Source progress
is tracked by the streaming checkpoint; the sink is made effectively
exactly-once by writing each micro-batch into its own ``batch_id=N``
partition with dynamic partition overwrite — a batch replayed after a
crash-between-write-and-commit OVERWRITES its own partition instead of
appending duplicates (foreachBatch alone is only at-least-once).

``Trigger.AvailableNow`` drains everything currently pending and stops, so
the same entry point serves both "catch up then exit" cron runs and (with
``available_now=False``) an always-on tail.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from calamari_spark.sources.synth import DOCUMENTS_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    media: DataFrame,
    out_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source stream of documents parquet -> extraction -> parquet sink.

    media is the (static) line-image store; a stream-static equi-join in
    every micro-batch. Output lands in ``out_dir/extracted/batch_id=N``
    (idempotent per batch — see module docstring); the stream checkpoint
    lives in ``out_dir/checkpoint`` (restart-safe: already processed input
    files are never re-read)."""
    from pyspark.sql import functions as F

    from calamari_spark.plans.extraction import extract_documents

    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs_stream = reader.parquet(input_dir)

    sink = os.path.join(out_dir, "extracted")
    checkpoint = os.path.join(out_dir, "checkpoint")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = extract_documents(batch_df, media).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        # dynamic overwrite of exactly this batch's partition: a replayed
        # batch rewrites batch_id=N in place instead of appending twice
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(sink)
        )

    writer = (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain(query: StreamingQuery, timeout_s: int = 600) -> None:
    """Wait for an availableNow stream to finish."""
    query.awaitTermination(timeout_s)
    if query.isActive:
        query.stop()
        raise TimeoutError("stream did not drain in time")


def read_stream_output(spark: SparkSession, out_dir: str) -> DataFrame:
    out = spark.read.parquet(os.path.join(out_dir, "extracted"))
    return out.drop("batch_id")  # sink-idempotence partition key, not payload
