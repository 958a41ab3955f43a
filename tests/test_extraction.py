"""End-to-end extraction pipeline tests (the north-star invariants).

The span-sequence-equality check mirrors the reference's golden-fixture
prediction tests (reference: calamari_ocr/test/test_prediction.py:107-118)
lifted to document granularity, and the CER gate mirrors
test_eval.py:56 (avg_ler threshold).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from calamari_spark.plans import extraction as X

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return X.load_interleaved(spark, SF)


def test_span_sequence_equality(spark, corpus):
    docs, media = corpus
    report = X.span_equality_report(
        X.extract_documents(docs, media), X.golden_documents(docs, media)
    ).collect()[0]
    assert report["total_docs"] == X.N_DOCS["0.001"]
    assert report["mismatch_docs"] == 0
    assert report["equal_docs"] == report["total_docs"]


def test_media_recognition_exact(spark, corpus):
    docs, media = corpus
    rec = X.x_media_text(spark, SF)
    joined = rec.join(media.select("media_ref", "gt"), "media_ref")
    n_bad = joined.filter(F.col("sentence") != F.col("gt")).count()
    assert n_bad == 0
    # CER quality gate (reference: test_eval.py:56 — ours must be exactly 0)
    cer = X.x_extract_cer(spark, SF).collect()[0]
    assert cer["avg_ler"] == 0.0
    assert cer["total_chars"] > 0


def test_extract_output_schema_matches_input(spark, corpus):
    docs, media = corpus
    out = X.extract_documents(docs, media)
    assert [f.name for f in out.schema["spans"].dataType.elementType.fields] == [
        "kind", "text", "media_ref", "offset",
    ]
    # every media span now carries text; offsets are the full 0..n-1 range
    row = out.filter(F.size("spans") >= 3).first()
    offsets = [s["offset"] for s in row["spans"]]
    assert offsets == list(range(len(offsets)))
    assert all(s["text"] is not None for s in row["spans"])


def test_reassembly_salting_preserves_order(spark):
    # adversarial ordering: arrival order reversed vs offset order
    rows = [("d1", "text", f"t{i}", None, i) for i in reversed(range(200))]
    df = spark.createDataFrame(
        rows, "doc_id string, kind string, text string, media_ref string, offset int"
    )
    out = X.reassemble_spans(df, n_salt=8).collect()
    assert len(out) == 1
    texts = [s["text"] for s in out[0]["spans"]]
    assert texts == [f"t{i}" for i in range(200)]


def test_recognize_positions_nested_output(spark, corpus):
    preds = X._recognized_with_positions(spark, SF).limit(20).collect()
    assert preds
    for r in preds:
        assert 0.0 < r["avg_char_probability"] <= 1.0
        assert r["n_folds"] == X.N_FOLDS
        starts = [p["global_start"] for p in r["positions"]]
        assert starts == sorted(starts)  # left-to-right reading order
        for p in r["positions"]:
            assert p["global_end"] >= p["global_start"]
            assert p["global_start_ext"] <= p["global_start"]
    # the DRIVER-facing variant serializes the tree to a sortable string
    json_rows = X.x_recognize_positions(spark, SF).limit(5).collect()
    assert all(isinstance(r["positions_json"], str) for r in json_rows)


def test_cnn_path_runs_and_is_deterministic(spark, corpus):
    out = X.x_extract_cnn(spark, SF).limit(10)
    a = [r.asDict() for r in out.collect()]
    b = [r.asDict() for r in out.collect()]
    assert a == b
    assert all(r["out_len"] > 0 and r["n_frames"] >= r["out_len"] for r in a)


def test_text_span_path_stays_jvm_side(spark, corpus):
    docs, _ = corpus
    spans = X.explode_spans(docs).filter(F.col("kind") == "text")
    from calamari_spark.functions.text import regularize_column

    plan = spans.select(
        regularize_column(F.col("text"), rulesets=X.TEXT_RULESETS).alias("t")
    )._jdf.queryExecution().executedPlan().toString()
    # the boilerplate strip must not fall out of whole-stage codegen into
    # Python — no row-at-a-time UDF nodes in the text path
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_word_segmentation_arithmetic():
    # glyph/space metrics: gap = 10 + 6k px for k spaces, frame-quantized
    for prev, cur, expect in [(4, 12, 0), (4, 14, 0), (8, 24, 1), (0, 16, 1), (4, 26, 2)]:
        assert X._spaces_between(prev, cur) == expect


def test_empty_and_null_span_docs_pass_through(spark, corpus):
    """A document with an empty (or null) spans array must still appear in
    the output with an empty spans array — explode() would silently drop it
    (the output-schema==input-schema contract)."""
    _, media = corpus
    docs = spark.createDataFrame(
        [
            ("empty", []),
            ("null", None),
            ("all_null", [None]),
            ("one", [("text", " hi  there ", None, 0)]),
        ],
        f"doc_id string, spans {X.SPANS_TYPE}",
    )
    out = {r["doc_id"]: r["spans"] for r in X.extract_documents(docs, media).collect()}
    assert set(out) == {"empty", "null", "all_null", "one"}
    assert out["empty"] == [] and out["null"] == [] and out["all_null"] == []
    assert out["one"][0]["text"] == "hi there"
    golden = {r["doc_id"]: r["spans"] for r in X.golden_documents(docs, media).collect()}
    assert set(golden) == {"empty", "null", "all_null", "one"}


def test_null_span_element_does_not_duplicate_doc(spark, corpus):
    """A null ELEMENT inside a real spans array must not emit the doc twice
    (once empty, once reassembled)."""
    _, media = corpus
    docs = spark.createDataFrame(
        [("d", [None, ("text", " a  b ", None, 0)])],
        f"doc_id string, spans {X.SPANS_TYPE}",
    )
    rows = X.extract_documents(docs, media).collect()
    assert len(rows) == 1
    assert [s["text"] for s in rows[0]["spans"]] == ["a b"]
