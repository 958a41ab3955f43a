"""Structured Streaming ingestion: incremental file discovery, exactly-once
per-file processing across restarts, output equality with the batch plan."""

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from calamari_spark.plans import extraction as X
from calamari_spark.streaming.stream import drain, read_stream_output, stream_extract

SF = "/root/testdata/sf0.001"


def _doc_files(sf_dir: str):
    d = Path(X.interleaved_dir_path(sf_dir)) / "documents_spans.parquet"
    return sorted(p for p in d.glob("*.parquet"))


def test_stream_matches_batch_and_is_incremental(spark, tmp_path):
    docs, media = X.load_interleaved(spark, SF)
    src_files = _doc_files(SF)
    assert len(src_files) >= 2, "need at least two input files for incrementality"
    half = len(src_files) // 2

    input_dir = tmp_path / "incoming"
    input_dir.mkdir()
    out_dir = str(tmp_path / "out")

    # phase 1: first half of the files land
    for p in src_files[:half]:
        shutil.copy(p, input_dir / p.name)
    drain(stream_extract(spark, str(input_dir), media, out_dir))
    n_phase1 = read_stream_output(spark, out_dir).count()
    assert n_phase1 > 0

    # phase 2: the rest land; a NEW query (fresh restart) drains only them
    for p in src_files[half:]:
        shutil.copy(p, input_dir / p.name)
    drain(stream_extract(spark, str(input_dir), media, out_dir))
    out = read_stream_output(spark, out_dir)
    assert out.count() == docs.count()  # every doc exactly once

    # value equality with the batch plan
    batch = X.extract_documents(docs, media).select(
        "doc_id", X._seq_col().alias("seq")
    )
    streamed = out.select("doc_id", X._seq_col().alias("seq"))
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0

    # re-draining with nothing new must add nothing (checkpoint exactness)
    drain(stream_extract(spark, str(input_dir), media, out_dir))
    assert read_stream_output(spark, out_dir).count() == docs.count()


def test_stateful_stream_dedup(spark, tmp_path):
    from calamari_spark.streaming.stateful import stream_dedup_docs

    docs, _ = X.load_interleaved(spark, SF)
    src_files = _doc_files(SF)
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    out = str(tmp_path / "dedup")

    # batch 1: originals
    for p in src_files:
        shutil.copy(p, input_dir / p.name)
    drain(stream_dedup_docs(spark, str(input_dir), out))
    unique = spark.read.parquet(f"{out}/unique")
    n_docs = docs.count()
    assert unique.count() == n_docs
    assert unique.agg(F.sum("dup_seen")).collect()[0][0] == 0

    # batch 2: the SAME files land again under new names (a re-crawl) —
    # state must suppress every one of them
    for p in src_files:
        shutil.copy(p, input_dir / ("again_" + p.name))
    drain(stream_dedup_docs(spark, str(input_dir), out))
    unique = spark.read.parquet(f"{out}/unique")
    assert unique.count() == n_docs  # no new rows
    assert unique.select("doc_id").distinct().count() == n_docs


def test_watermarked_window_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with a 1h watermark: a row arriving after
    the watermark passed its window is dropped; finalized windows emit
    exactly once with the on-time counts."""
    import datetime as dt

    from calamari_spark.streaming.windowed import (
        read_windows,
        stream_windowed_counts,
    )

    def ts(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    input_dir = tmp_path / "ev"
    input_dir.mkdir()
    out = str(tmp_path / "win")
    schema = "event_id long, user_id long, event_type string, ts timestamp, value double"

    # batch 1: three rows in [10:00,11:00) + one at 12:30 that pushes the
    # watermark to 11:30 (> 11:00), finalizing the 10-o'clock window
    b1 = spark.createDataFrame(
        [
            (1, 1, "click", ts(10, 5), 1.0),
            (2, 1, "click", ts(10, 20), 2.0),
            (3, 2, "click", ts(10, 50), 3.0),
            (4, 2, "click", ts(12, 30), 4.0),
        ],
        schema,
    )
    b1.write.mode("overwrite").parquet(str(input_dir / "b1.parquet"))
    drain(stream_windowed_counts(spark, str(input_dir), out))

    # batch 2: a LATE row for the finalized 10-o'clock window (watermark is
    # 11:30 -> must be dropped) + one at 14:00 advancing the watermark past
    # 13:00 so the 12-o'clock window finalizes too
    b2 = spark.createDataFrame(
        [
            (5, 3, "click", ts(10, 30), 100.0),  # too late: dropped
            (6, 3, "click", ts(14, 0), 5.0),
        ],
        schema,
    )
    b2.write.mode("overwrite").parquet(str(input_dir / "b2.parquet"))
    drain(stream_windowed_counts(spark, str(input_dir), out))

    rows = {
        (r["window_start"].hour, r["event_type"]): (r["n"], r["total_value"])
        for r in read_windows(spark, out).collect()
    }
    # the 10-o'clock window emitted with the ON-TIME rows only — the late
    # row was dropped (watermark restored from run 1's checkpoint is 11:30)
    assert rows[(10, "click")] == (3, 6.0)
    # run 2's trailing no-data batch flushed the 12-o'clock window too
    # (watermark advanced to 13:00 by the 14:00 row)
    assert rows[(12, "click")] == (1, 4.0)
    # the 14-o'clock window is still open (watermark has not passed 15:00)
    assert (14, "click") not in rows

    # run 3: nothing in a still-open window re-emits; finalized windows
    # never emit twice (append-mode exactly-once per window)
    b3 = spark.createDataFrame([(7, 3, "click", ts(16, 30), 6.0)], schema)
    b3.write.mode("overwrite").parquet(str(input_dir / "b3.parquet"))
    drain(stream_windowed_counts(spark, str(input_dir), out))
    all_rows = read_windows(spark, out).collect()
    assert len(all_rows) == 3  # 10-, 12-, and now the 14-o'clock window
    rows = {
        (r["window_start"].hour, r["event_type"]): (r["n"], r["total_value"])
        for r in all_rows
    }
    assert rows[(10, "click")] == (3, 6.0)  # unchanged, emitted exactly once
    assert rows[(14, "click")] == (1, 5.0)  # flushed: watermark now 15:30
    assert (16, "click") not in rows  # 16-o'clock window still open
