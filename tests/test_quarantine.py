"""Per-record failure policy: corrupt media blobs at 10^12-doc scale.

A deterministic per-record raise inside the OCR UDF fails its task on
every retry — one bad byte kills the whole job. on_error="fail" keeps
that strict contract (driver-attested queries); on_error="quarantine"
keeps the document, NULLs the failed span's text, records the error, and
surfaces a per-bucket n_failed metric.
"""

import pytest
from pyspark.sql import functions as F

from calamari_spark.plans import extraction as X
from calamari_spark.plans import lineage as L

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corrupted(spark):
    """The sf0.001 corpus with ONE media blob replaced by garbage bytes."""
    docs, media = X.load_interleaved(spark, SF)
    bad_ref = media.select("media_ref").orderBy("media_ref").first()["media_ref"]
    media_bad = media.withColumn(
        "png",
        F.when(F.col("media_ref") == bad_ref, F.lit(b"not a png at all"))
        .otherwise(F.col("png")),
    )
    return docs, media, media_bad, bad_ref


def test_fail_mode_raises_on_corrupt_blob(spark, corrupted):
    docs, _, media_bad, _ = corrupted
    with pytest.raises(Exception, match="not a PNG"):
        X.extract_documents(docs, media_bad).count()


def test_quarantine_keeps_document_and_nulls_failed_span(spark, corrupted):
    docs, media, media_bad, bad_ref = corrupted
    out = X.extract_documents(docs, media_bad, on_error="quarantine")
    rows = out.collect()
    # contract survives: every input doc is in the output
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in docs.collect()}
    failed = [
        (r["doc_id"], s)
        for r in rows
        for s in r["spans"]
        if s["kind"] == "media" and s["text"] is None
    ]
    assert [s["media_ref"] for _, s in failed] == [bad_ref]
    # every OTHER span equals the clean-corpus output
    clean = {r["doc_id"]: r["spans"] for r in X.extract_documents(docs, media).collect()}
    for r in rows:
        for got, want in zip(r["spans"], clean[r["doc_id"]]):
            if got["media_ref"] == bad_ref and got["kind"] == "media":
                continue
            assert got == want


def test_quarantine_recognize_stage_emits_error_column(spark, corrupted):
    docs, _, media_bad, bad_ref = corrupted
    spans = X.explode_spans(docs).filter(F.col("kind") == "media").select(
        "doc_id", "offset", "media_ref"
    )
    with_png = spans.join(media_bad.select("media_ref", "png"), "media_ref")
    rec = X.recognize_media(with_png, with_positions=False, on_error="quarantine")
    errs = rec.filter(F.col("error").isNotNull()).collect()
    assert {r["media_ref"] for r in errs} == {bad_ref}
    assert all(r["sentence"] is None for r in errs)
    assert all("not a PNG" in r["error"] for r in errs)
    # clean lines are untouched
    ok = rec.filter(F.col("error").isNull())
    assert ok.filter(F.col("sentence").isNull()).count() == 0


def test_quarantine_metric_counts_failures_per_bucket(spark, corrupted, tmp_path):
    docs, _, media_bad, bad_ref = corrupted
    out = str(tmp_path / "qjob")
    r = L.run_extraction_job(
        spark, docs, media_bad, out, n_buckets=4, buckets_per_wave=4,
        on_error="quarantine",
    )
    assert r["status"] == "complete"
    m = L.read_metrics(spark, out)
    rows = m.collect()
    assert sum(r["n_failed"] for r in rows) == 1
    # the failure must not pollute the CER of the surviving lines
    assert all(r["cer"] == 0.0 for r in rows if r["cer"] is not None)
    # the quarantine table carries the REASON, reachable from the job output
    q = L.read_quarantine(spark, out).collect()
    assert len(q) == 1
    assert q[0]["media_ref"] == bad_ref
    assert "not a PNG" in q[0]["error"]


def test_unknown_and_null_kind_spans_pass_through(spark):
    """Spans that are neither text nor media but carry payload (unknown
    kind, or kind NULL with populated fields) must survive extraction
    unmodified — not be silently dropped; a doc whose only span is an
    all-null struct is preserved with an empty spans array."""
    docs, media = X.load_interleaved(spark, SF)
    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    weird = spark.createDataFrame(
        [
            ("w1", [("mystery", "payload A", None, 0), ("text", "hi", None, 1)]),
            ("w2", [(None, "null-kind payload", None, 0)]),
            ("w3", [(None, None, None, None)]),  # all-null struct
        ],
        schema,
    )
    out = {r["doc_id"]: r["spans"] for r in X.extract_documents(weird, media).collect()}
    assert set(out) == {"w1", "w2", "w3"}
    assert [(s["kind"], s["text"]) for s in out["w1"]] == [
        ("mystery", "payload A"), ("text", "hi"),
    ]
    assert [(s["kind"], s["text"]) for s in out["w2"]] == [(None, "null-kind payload")]
    assert out["w3"] == []
    # the pre-flight validator counts both bad-kind shapes
    import calamari_spark.plans.extraction as ext

    orig = ext.load_interleaved
    try:
        ext.load_interleaved = lambda _s, _d: (weird, media)
        rep = ext.x_span_integrity(spark, SF).collect()[0]
    finally:
        ext.load_interleaved = orig
    assert rep["bad_kind"] == 2  # 'mystery' + null-kind-with-payload
    assert rep["n_spans"] == 3  # the all-null struct is a placeholder, not a span


@pytest.fixture(scope="module")
def dangling(spark):
    """The sf0.001 corpus with ONE media blob deleted from the media store
    (the span still references it)."""
    docs, media = X.load_interleaved(spark, SF)
    bad_ref = media.select("media_ref").orderBy("media_ref").first()["media_ref"]
    media_missing = media.filter(F.col("media_ref") != bad_ref)
    return docs, media_missing, bad_ref


def test_dangling_media_ref_fails_loudly(spark, dangling):
    """An inner join would silently DROP the span from the document —
    breaking the span-sequence contract; strict mode must fail instead."""
    docs, media_missing, _ = dangling
    with pytest.raises(Exception, match="missing media blob"):
        X.extract_documents(docs, media_missing).count()


def test_dangling_media_ref_quarantined(spark, dangling):
    docs, media_missing, bad_ref = dangling
    out = X.extract_documents(docs, media_missing, on_error="quarantine")
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in docs.collect()}
    kept = [
        s
        for r in rows
        for s in r["spans"]
        if s["kind"] == "media" and s["media_ref"] == bad_ref
    ]
    # the span is STILL IN the sequence, with NULL text
    assert len(kept) >= 1
    assert all(s["text"] is None for s in kept)


def test_span_integrity_detects_violations(spark, monkeypatch):
    """x_span_integrity (pre-flight validation) must count each violation
    class: clean corpus = all zeros; a doctored corpus with one dangling
    ref, one unknown kind, and one negative offset reports exactly those."""
    import calamari_spark.plans.extraction as ext

    clean = ext.x_span_integrity(spark, SF).collect()[0]
    assert clean["bad_kind"] == clean["media_null_ref"] == 0
    assert clean["bad_offset"] == clean["dangling_refs"] == 0
    assert clean["n_spans"] > 0

    docs, media = ext.load_interleaved(spark, SF)
    doctored = docs.select(
        "doc_id",
        F.transform(
            "spans",
            lambda s, i: F.struct(
                F.when(i == 0, F.lit("mystery")).otherwise(s["kind"]).alias("kind"),
                s["text"].alias("text"),
                F.when(s["media_ref"] == "line_000001", F.lit("line_GONE"))
                .otherwise(s["media_ref"]).alias("media_ref"),
                F.when(i == 1, F.lit(-7)).otherwise(s["offset"]).alias("offset"),
            ),
        ).alias("spans"),
    ).limit(1)
    monkeypatch.setattr(
        ext, "load_interleaved", lambda _spark, _sf: (doctored, media)
    )
    bad = ext.x_span_integrity(spark, SF).collect()[0]
    assert bad["bad_kind"] == 1
    assert bad["bad_offset"] == 1


def test_contract_holds_on_adversarial_random_corpus(spark):
    """Doc-set and span-multiset preservation over a seeded batch of random
    adversarial shapes (no media spans, so the whole batch runs in one fast
    Spark job): arrays that are None/empty/[null]/all-null structs, unknown
    kinds, NULL kinds with payload, NULL and negative offsets. Contract:
    every input doc_id appears exactly once in the output, every
    payload-carrying span survives (text spans regularized, everything else
    byte-identical), placeholders vanish."""
    import random

    from calamari_spark.functions.text import regularize_str

    rng = random.Random(0xC0FFEE)
    kinds = ["text", "weird", "x", None]
    docs_rows = []
    for i in range(60):
        doc_id = f"r{i:03d}"
        shape = rng.random()
        if shape < 0.1:
            docs_rows.append((doc_id, None))
            continue
        if shape < 0.2:
            docs_rows.append((doc_id, []))
            continue
        spans = []
        for j in range(rng.randint(1, 6)):
            if rng.random() < 0.15:
                spans.append(None)
                continue
            if rng.random() < 0.1:
                spans.append((None, None, None, None))
                continue
            kind = rng.choice(kinds)
            text = rng.choice([f"body {i}.{j}", "", None])
            offset = rng.choice([j, -j - 1, None])
            spans.append((kind, text, None, offset))
        docs_rows.append((doc_id, spans))

    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    docs = spark.createDataFrame(docs_rows, schema)
    _, media = X.load_interleaved(spark, SF)
    out = {r["doc_id"]: r["spans"] for r in X.extract_documents(docs, media).collect()}

    assert sorted(out) == sorted(d for d, _ in docs_rows)
    for doc_id, spans in docs_rows:
        payload = [
            s for s in (spans or [])
            if s is not None and any(v is not None for v in s)
        ]
        got = out[doc_id]
        assert len(got) == len(payload), doc_id
        # sort both by the same total-order key (None sorts first)
        order = lambda t: tuple((v is not None, v) for v in t)  # noqa: E731
        want = sorted(
            [
                (
                    s[0],
                    regularize_str(s[1], rulesets=X.TEXT_RULESETS)
                    if s[0] == "text" and s[1] is not None else s[1],
                    s[2],
                    s[3],
                )
                for s in payload
            ],
            key=order,
        )
        got_t = sorted(
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got],
            key=order,
        )
        assert got_t == want, doc_id


def test_read_quarantine_survives_pre_lineage_kill(spark, tmp_path):
    """Kill window: quarantine parquet written, process dies before the
    FIRST lineage commit — read_quarantine must return an empty frame, not
    crash on the missing lineage path."""
    out = str(tmp_path / "killed")
    spark.createDataFrame(
        [(0, "d1", "m1", 0, "boom", "run_x")],
        "bucket int, doc_id string, media_ref string, offset int,"
        " error string, run_id string",
    ).write.parquet(f"{out}/quarantine")
    assert L.read_quarantine(spark, out).count() == 0


def test_bad_on_error_value_rejected(spark, corrupted):
    docs, media, _, _ = corrupted
    with pytest.raises(ValueError, match="on_error"):
        spans = X.explode_spans(docs).filter(F.col("kind") == "media").select(
            "doc_id", "offset", "media_ref"
        )
        X.recognize_media(
            spans.join(media.select("media_ref", "png"), "media_ref"),
            on_error="ignore",
        )


def test_repeated_media_ref_failing_twice_quarantines_exactly_twice(spark, tmp_path):
    """A document that references the SAME corrupt media_ref at two offsets
    must produce exactly 2 quarantine rows (one per failed span), never 4 —
    the rebuild join carries offset so the failed x re-run join cannot fan
    out, and the table agrees with the n_failed metric."""
    docs = spark.createDataFrame(
        [(
            "dup-doc",
            [
                ("text", "hello", None, 0),
                ("media", None, "m-dup", 1),
                ("text", "world", None, 2),
                ("media", None, "m-dup", 3),
            ],
        )],
        f"doc_id string, spans {X.SPANS_TYPE}",
    )
    media = spark.createDataFrame(
        [("m-dup", bytearray(b"not a png at all"))], "media_ref string, png binary"
    )
    out = str(tmp_path / "dupjob")
    r = L.run_extraction_job(
        spark, docs, media, out, n_buckets=2, buckets_per_wave=2,
        on_error="quarantine",
    )
    assert r["status"] == "complete"
    n_failed = sum(x["n_failed"] for x in L.read_metrics(spark, out).collect())
    assert n_failed == 2
    q = L.read_quarantine(spark, out).collect()
    assert len(q) == 2  # was 4 before the offset-keyed join
    assert sorted((x["doc_id"], x["media_ref"], x["offset"]) for x in q) == [
        ("dup-doc", "m-dup", 1),
        ("dup-doc", "m-dup", 3),
    ]
    assert all("not a PNG" in x["error"] for x in q)
