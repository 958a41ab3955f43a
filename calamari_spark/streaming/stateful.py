"""Custom stateful streaming operator: cross-batch document dedup.

``applyInPandasWithState`` keeps a per-key GroupState across micro-batches:
the first time a doc_id arrives it is emitted, every later arrival (a
re-crawl, a duplicate upload) is dropped. This is the streaming twin of the
batch exact-dedup query and the pattern slot for any custom stateful
operator the engine needs (running CER accumulators, per-source rate
stats). At cluster scale state is HDFS/RocksDB-backed and partitioned by
the grouping key — no driver involvement.
"""

from __future__ import annotations

import os
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from calamari_spark.sources.synth import DOCUMENTS_SCHEMA

DEDUP_OUT_SCHEMA = "doc_id string, n_spans int, dup_seen int"
STATE_SCHEMA = "seen int"


def _dedup_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = state.get[0] if state.exists else 0
    total = 0
    first: pd.DataFrame | None = None
    for pdf in pdfs:
        if first is None and len(pdf) > 0:
            first = pdf.iloc[:1]
        total += len(pdf)
    state.update((seen + total,))
    if seen == 0 and first is not None:
        yield pd.DataFrame(
            {
                "doc_id": [key[0]],
                "n_spans": [int(len(first.iloc[0]["spans"]))],
                "dup_seen": [total - 1],
            }
        )


def stream_dedup_docs(
    spark: SparkSession, input_dir: str, out_dir: str, available_now: bool = True
) -> StreamingQuery:
    """documents stream -> first-occurrence-only stream (exactly-once per
    doc_id across ALL micro-batches and restarts, courtesy of the state
    store + checkpoint)."""
    docs = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(input_dir)
    deduped = docs.groupBy("doc_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "unique"))
        .option("checkpointLocation", os.path.join(out_dir, "checkpoint"))
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
