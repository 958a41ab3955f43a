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
