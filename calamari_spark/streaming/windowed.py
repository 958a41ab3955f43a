"""Watermarked tumbling-window streaming aggregation over the events feed.

The engine's streaming shape for late-arriving data: event-time windows
finalize once the watermark (max event time − allowed lateness) passes the
window end; rows later than the watermark are DROPPED, not silently mixed
into already-emitted windows. Append output mode emits each window exactly
once, on finalization — downstream consumers never see a window twice.

Batch twin: q_events_tumbling (same groupBy(window, event_type) agg).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

EVENTS_SCHEMA = "event_id long, user_id long, event_type string, ts timestamp, value double"


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    window: str = "1 hour",
    lateness: str = "1 hour",
) -> StreamingQuery:
    """File-source events stream -> watermark -> tumbling window counts ->
    append-mode parquet sink (exactly-once per finalized window via the
    native file sink's transaction log)."""
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("recursiveFileLookup", "true")  # batches may land as dirs
        .parquet(input_dir)
    )
    agg = (
        events.withWatermark("ts", lateness)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "windows"))
        .option("checkpointLocation", os.path.join(out_dir, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def read_windows(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "windows"))
