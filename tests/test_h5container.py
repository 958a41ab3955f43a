"""Codec-embedded container (HDF5-analog) round-trip tests."""

import pytest
from pyspark.sql import functions as F

from calamari_spark.sources.h5container import (
    read_codec,
    read_h5_container,
    store_predictions,
    write_h5_container,
)


def test_roundtrip_decodes_through_embedded_codec(spark, tmp_path):
    df = spark.createDataFrame(
        [("a/0", "hello world"), ("a/1", "dew"), ("a/2", "old hold")],
        "id string, text string",
    )
    path = str(tmp_path / "c0")
    codec = write_h5_container(df, path)
    assert codec == sorted(set("hello world" + "dew" + "old hold"))
    back = read_h5_container(spark, path)
    got = {r["id"]: r["text"] for r in back.collect()}
    assert got == {"a/0": "hello world", "a/1": "dew", "a/2": "old hold"}
    # the stored transcript really is ints indexing the codec
    raw = spark.read.parquet(f"{path}/data.parquet").first()
    assert all(isinstance(v, int) for v in raw["transcript"])
    assert read_codec(spark, path) == codec


def test_predictions_reencode_with_source_codec(spark, tmp_path):
    src = str(tmp_path / "src")
    write_h5_container(
        spark.createDataFrame([("x/0", "abc cab")], "id string, text string"), src
    )
    preds = spark.createDataFrame([("x/0", "bac")], "id string, sentence string")
    out = str(tmp_path / "pred")
    store_predictions(preds, src, out)
    back = read_h5_container(spark, out)
    assert back.first()["text"] == "bac"


def test_out_of_codec_prediction_raises(spark, tmp_path):
    src = str(tmp_path / "src2")
    write_h5_container(
        spark.createDataFrame([("x/0", "abc")], "id string, text string"), src
    )
    preds = spark.createDataFrame([("x/0", "abz")], "id string, sentence string")
    with pytest.raises(ValueError, match="not in the source codec"):
        store_predictions(preds, src, str(tmp_path / "pred2"))


def test_images_ride_along(spark, tmp_path):
    df = spark.createDataFrame(
        [("i/0", "hi", bytearray(b"\x01\x02\x03\x04\x05\x06"), [2, 3])],
        "id string, text string, image binary, dims array<int>",
    )
    path = str(tmp_path / "c1")
    write_h5_container(df, path)
    r = read_h5_container(spark, path).first()
    assert bytes(r["image"]) == b"\x01\x02\x03\x04\x05\x06"
    assert r["dims"] == [2, 3]
    assert r["text"] == "hi"


def test_fold_split_writer(spark, tmp_path):
    from calamari_spark.sources.h5container import write_fold_split

    df = spark.createDataFrame(
        [(f"d/{i}", "ab" * (i % 3 + 1)) for i in range(40)], "id string, text string"
    )
    path = str(tmp_path / "folds")
    write_fold_split(df, path, n_folds=4)
    data = spark.read.parquet(f"{path}/data.parquet")
    folds = {r["fold_id"] for r in data.select("fold_id").distinct().collect()}
    assert folds == {0, 1, 2, 3}
    assert data.count() == 40
    # decode still works through the shared codec
    back = read_h5_container(spark, path)
    assert {r["text"] for r in back.collect()} == {"ab", "abab", "ababab"}


def test_write_eval_report_sheets(spark, tmp_path):
    from calamari_spark.plans.evalplans import write_eval_report

    out = str(tmp_path / "report")
    res = write_eval_report(spark, "/root/testdata/sf0.001", out)
    assert res["sheets"] == ["per_line", "confusions", "histogram"]
    per_line = spark.read.option("header", True).csv(f"{out}/per_line")
    assert per_line.count() > 0
    assert set(per_line.columns) >= {"doc_id", "gt", "pred", "len", "err", "cer", "rel_err"}
    hist = spark.read.option("header", True).csv(f"{out}/histogram")
    assert {"bucket", "n_lines"} <= set(hist.columns)
    conf = spark.read.option("header", True).csv(f"{out}/confusions")
    assert conf.count() > 0
