"""Container-format scans/sinks: PAGE-XML, Abbyy XML, file pairs,
extended predictions (SURVEY.md §2.A)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from calamari_spark.sources.abbyy import cutout_rect, parse_abbyy, read_abbyy
from calamari_spark.sources.pagexml import (
    coords_to_box,
    cutout_box,
    parse_page,
    read_pagexml,
    store_pagexml,
    write_predictions,
)

NS = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"

PAGE_XML = f"""<?xml version="1.0" encoding="UTF-8"?>
<PcGts xmlns="{NS}">
 <Page imageFilename="p1.png" imageWidth="400" imageHeight="120">
  <TextRegion id="r0">
   <TextLine id="r0l0">
    <Coords points="10,10 200,10 200,40 10,40"/>
    <TextEquiv index="0"><Unicode>the problem set up</Unicode></TextEquiv>
   </TextLine>
   <TextLine id="r0l1" comments="skip me maybe">
    <Coords points="10,50 220,50 220,80 10,80"/>
    <TextEquiv index="2"><Unicode>worse alternative</Unicode></TextEquiv>
    <TextEquiv index="0"><Unicode>spark line data</Unicode></TextEquiv>
   </TextLine>
  </TextRegion>
  <TextRegion id="r1">
   <TextLine id="r1l0">
    <Coords points="10,90 150,90 150,115 10,115"/>
    <TextEquiv index="0"><Unicode>vote fold char</Unicode></TextEquiv>
   </TextLine>
  </TextRegion>
 </Page>
</PcGts>"""

ABBYY_XML = """<?xml version="1.0" encoding="UTF-8"?>
<document xmlns="http://www.abbyy.com/FineReader_xml/FineReader10-schema-v1.xml">
 <page width="400" height="120" resolution="300">
  <block blockType="Text" l="5" t="5" r="395" b="115">
   <text><par>
    <line l="10" t="10" r="200" b="40" baseline="35">
     <formatting lang="en">
      <charParams l="10" t="10" r="20" b="40">t</charParams>
      <charParams l="20" t="10" r="30" b="40">h</charParams>
      <charParams l="30" t="10" r="40" b="40">e</charParams>
     </formatting>
    </line>
    <line l="10" t="50" r="220" b="80"><formatting>scan merge</formatting></line>
   </par></text>
  </block>
  <block blockType="Picture" l="0" t="0" r="10" b="10"/>
 </page>
</document>"""


def test_parse_page_order_and_text_index():
    rows = parse_page(PAGE_XML)
    assert [r["line_id"] for r in rows] == ["r0l0", "r0l1", "r1l0"]
    assert [r["order"] for r in rows] == [0, 1, 2]
    # lowest TextEquiv index wins
    assert rows[1]["text"] == "spark line data"
    assert rows[0]["region_id"] == "r0" and rows[2]["region_id"] == "r1"


def test_parse_page_skip_commented():
    rows = parse_page(PAGE_XML, skip_commented=True)
    assert [r["line_id"] for r in rows] == ["r0l0", "r1l0"]


def test_coords_cutout():
    assert coords_to_box("10,10 200,10 200,40 10,40") == (10, 10, 201, 41)
    img = np.arange(120 * 400, dtype=np.uint8).reshape(120, 400) % 251
    cut = cutout_box(img, "10,10 200,10 200,40 10,40")
    assert cut.shape == (31, 191)
    assert cut[0, 0] == img[10, 10]


def test_pagexml_spark_roundtrip(spark):
    pages = spark.createDataFrame(
        [("p1", PAGE_XML), ("p2", PAGE_XML)], "doc_id string, xml string"
    )
    lines = read_pagexml(pages)
    assert lines.count() == 6
    preds = spark.createDataFrame(
        [("p1", "r0l0", "THE PROBLEM", 0.93), ("p2", "r1l0", "VOTE", 0.88)],
        "doc_id string, line_id string, sentence string, conf double",
    )
    stored = {r["doc_id"]: r["xml"] for r in store_pagexml(pages, preds).collect()}
    back = parse_page(stored["p1"])
    assert back[0]["text"] == "the problem set up"  # index 0 untouched
    assert "THE PROBLEM" in stored["p1"] and 'conf="0.9300"' in stored["p1"]
    assert "VOTE" in stored["p2"] and "THE PROBLEM" not in stored["p2"]
    # writing again replaces, not duplicates, the index=1 equiv
    twice = write_predictions(stored["p1"], {"r0l0": ("NEW", 0.5)})
    assert twice.count("THE PROBLEM") == 0 and twice.count("NEW") == 1


def test_abbyy_parse_and_spark(spark):
    rows = parse_abbyy(ABBYY_XML)
    assert len(rows) == 2  # picture block skipped
    assert rows[0]["text"] == "the"
    assert rows[1]["text"] == "scan merge"
    assert (rows[0]["l"], rows[0]["t"], rows[0]["r"], rows[0]["b"]) == (10, 10, 200, 40)
    img = np.zeros((120, 400), dtype=np.uint8)
    assert cutout_rect(img, 10, 10, 200, 40).shape == (30, 190)
    df = read_abbyy(
        spark.createDataFrame([("a1", ABBYY_XML)], "doc_id string, xml string")
    )
    assert df.count() == 2


def test_file_pairs_join_and_sink(spark, tmp_path):
    from calamari_spark.sources.filepairs import read_file_pairs, to_pred_files
    from calamari_spark.sources.font import render_line
    from calamari_spark.sources.pngio import encode_png

    d = tmp_path / "lines"
    d.mkdir()
    for i, text in enumerate(["scan merge", "vote fold", "spark line"]):
        (d / f"line{i:02d}.png").write_bytes(encode_png(render_line(text)))
        if i != 2:  # one image lacks GT
            (d / f"line{i:02d}.gt.txt").write_text(text)

    inner = read_file_pairs(spark, f"{d}/*.png", f"{d}/*.gt.txt")
    assert inner.count() == 2
    left = read_file_pairs(spark, f"{d}/*.png", f"{d}/*.gt.txt", keep_matched_only=False)
    assert left.count() == 3
    assert left.filter(F.col("gt").isNull()).count() == 1

    preds = inner.select("id", F.upper("gt").alias("sentence"))
    out = tmp_path / "preds"
    n = to_pred_files(preds, str(out))
    assert n == 2
    assert (out / "line00.pred.txt").read_text() == "SCAN MERGE"


def test_extended_prediction_roundtrip(spark):
    from calamari_spark.plans.extraction import _recognized_with_positions
    from calamari_spark.sources.extended import (
        read_extended_pred,
        to_extended_pred,
    )

    preds = _recognized_with_positions(spark, "/root/testdata/sf0.001").limit(25)
    packed = to_extended_pred(preds)
    row = packed.first()
    assert isinstance(row["pred"], (bytes, bytearray)) and len(row["pred"]) > 0
    back = read_extended_pred(packed)
    orig = {r["media_ref"]: r for r in preds.collect()}
    for r in back.collect():
        o = orig[r["media_ref"]]
        assert r["sentence"] == o["sentence"]
        assert abs(r["avg_char_probability"] - o["avg_char_probability"]) < 1e-9
        assert [p["char"] for p in r["positions"]] == [p["char"] for p in o["positions"]]
        assert [p["global_start"] for p in r["positions"]] == [
            p["global_start"] for p in o["positions"]
        ]


def test_abbyy_store_back(spark):
    from calamari_spark.sources.abbyy import store_abbyy

    pages = spark.createDataFrame([("a1", ABBYY_XML)], "doc_id string, xml string")
    preds = spark.createDataFrame(
        [("a1", "p0_b0_l0", "THE FIXED")],
        "doc_id string, line_id string, sentence string",
    )
    out = {r["doc_id"]: r["xml"] for r in store_abbyy(pages, preds).collect()}
    assert "THE FIXED" in out["a1"]
    back = parse_abbyy(out["a1"])
    assert back[0]["text"] == "THE FIXED"
    assert back[1]["text"] == "scan merge"  # untouched line survives


def test_str_to_char_list():
    from calamari_spark.functions.text import str_to_char_list

    # greedy longest match: multi-char symbols win over their prefixes
    assert str_to_char_list("chab", ["a", "b", "c", "h", "ch"]) == ["ch", "a", "b"]
    assert str_to_char_list("aab", ["a", "aa", "b"]) == ["aa", "b"]
    with pytest.raises(ValueError):
        str_to_char_list("xyz", ["a", "b"])


def test_container_roundtrips_skip_blank_documents(spark, tmp_path):
    """Review-caught latent mismatch: a blank document rendered one empty
    line, and the Abbyy rescan's itertext().strip() read the stored
    'PRED: ' back as 'PRED:' while the string oracle kept the trailing
    space. Blank docs are now excluded from the synthesized pages in BOTH
    engines (_doc_lines filter mirrored by the CTE's WHERE)."""
    import duckdb

    from calamari_spark.plans.containerplans import (
        X_ABBYY_ROUNDTRIP_SQL,
        x_abbyy_roundtrip,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "some real words here")],
        "doc_id long, text string",
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    out = x_abbyy_roundtrip(spark, sf_dir).toPandas()
    assert set(out.doc_id) == {3}
    assert (out.stored_text == "PRED: " + out.gt_text).all()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    ddf = con.execute(X_ABBYY_ROUNDTRIP_SQL).df()
    assert set(ddf.doc_id) == {3}
