"""Checkpoint/resume at partition (doc_id-bucket) granularity."""

import pytest
from pyspark.sql import functions as F

from calamari_spark.plans import extraction as X
from calamari_spark.plans import lineage as L

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return X.load_interleaved(spark, SF)


def test_kill_and_resume_produces_identical_output(spark, corpus, tmp_path):
    docs, media = corpus
    out = str(tmp_path / "job")

    # run 1: killed after one wave
    r1 = L.run_extraction_job(
        spark, docs, media, out, n_buckets=8, buckets_per_wave=3, fail_after_waves=1
    )
    assert r1["status"] == "killed"
    assert len(r1["completed_buckets"]) == 3
    assert len(r1["pending_buckets"]) == 5

    # resume: must process ONLY the pending buckets
    r2 = L.run_extraction_job(spark, docs, media, out, n_buckets=8, buckets_per_wave=3)
    assert r2["status"] == "complete"
    assert r2["completed_buckets"] == list(range(8))

    # lineage: the first run's buckets keep their original run_id (i.e.
    # resume did not reprocess them)
    lin = spark.read.parquet(f"{out}/lineage")
    per_bucket = lin.groupBy("bucket").count().collect()
    assert all(r["count"] == 1 for r in per_bucket)
    assert lin.select("run_id").distinct().count() == 2

    # output equality vs a direct single-shot run
    resumed = L.read_extracted(spark, out)
    direct = X.extract_documents(docs, media)
    a = resumed.select("doc_id", X._seq_col().alias("seq"))
    b = direct.select("doc_id", X._seq_col().alias("seq"))
    assert a.count() == b.count() == docs.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_metrics_table_shape(spark, corpus, tmp_path):
    docs, media = corpus
    out = str(tmp_path / "job")
    L.run_extraction_job(spark, docs, media, out, n_buckets=4, buckets_per_wave=2)
    m = L.read_metrics(spark, out)
    rows = m.collect()
    assert {r["bucket"] for r in rows} == set(range(4))
    assert all(r["n_docs"] > 0 and r["n_spans"] >= r["n_media"] >= 0 for r in rows)
    assert all(r["wave_wall_s"] > 0 for r in rows)
    # per-partition quality + throughput metrics (the north rule's table):
    # the template ensemble is exact, so CER must be 0 in every bucket
    assert all(r["cer"] == 0.0 for r in rows)
    assert all(r["lines_per_sec"] > 0 for r in rows)
    total_docs = sum(r["n_docs"] for r in rows)
    assert total_docs == docs.count()


def test_catalog_table_corpus_path(spark, corpus, tmp_path):
    """The cluster ingestion path: the corpus enters via catalog table
    names (spark.read.table — Iceberg on a real cluster, warehouse-managed
    tables here; the API the job exercises is identical) and the job output
    must equal the parquet-path run byte for byte."""
    docs, media = corpus
    docs.write.mode("overwrite").saveAsTable("it_docs_spans")
    media.write.mode("overwrite").saveAsTable("it_line_images")
    try:
        tdocs, tmedia = X.load_interleaved_tables(spark, "it_docs_spans", "it_line_images")
        out = str(tmp_path / "tbl_job")
        r = L.run_extraction_job(spark, tdocs, tmedia, out, n_buckets=4, buckets_per_wave=4)
        assert r["status"] == "complete"
        got = L.read_extracted(spark, out).select("doc_id", X._seq_col().alias("seq"))
        want = X.extract_documents(docs, media).select("doc_id", X._seq_col().alias("seq"))
        assert got.count() == want.count() == docs.count()
        assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS it_docs_spans")
        spark.sql("DROP TABLE IF EXISTS it_line_images")


def test_bucket_assignment_deterministic_and_uniform(spark, corpus):
    docs, _ = corpus
    b1 = {r["doc_id"]: r["bucket"] for r in L.with_bucket(docs, 8).select("doc_id", "bucket").collect()}
    b2 = {r["doc_id"]: r["bucket"] for r in L.with_bucket(docs.repartition(7), 8).select("doc_id", "bucket").collect()}
    assert b1 == b2  # independent of physical layout
    assert all(0 <= v < 8 for v in b1.values())
