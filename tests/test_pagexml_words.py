"""Word/Glyph-precision PageXML store-back (reference: reader.py:507-628)."""

import xml.etree.ElementTree as ET

from calamari_spark.sources.pagexml import NS, write_predictions


def _q(tag):
    return f"{{{NS}}}{tag}"


PAGE = f"""<?xml version="1.0"?>
<PcGts xmlns="{NS}">
 <Page>
  <TextRegion id="r0">
   <TextLine id="l0">
    <Coords points="100,50 300,50 300,90 100,90"/>
    <Word id="w_old_1"><TextEquiv index="0"><Unicode>stale</Unicode></TextEquiv></Word>
    <TextEquiv index="0"><Unicode>gt text</Unicode></TextEquiv>
   </TextLine>
  </TextRegion>
 </Page>
</PcGts>"""


def _positions():
    # "ab cd": 4 glyphs + 1 space, extents in line-local pixels
    def g(ch, s, e, alts=()):
        return {
            "char": ch,
            "probability": 0.9,
            "global_start_ext": s,
            "global_end_ext": e,
            "alts": [{"char": a, "probability": 0.05} for a in alts],
        }

    return [g("a", 0, 10, alts="o"), g("b", 10, 20), g(" ", 20, 26),
            g("c", 26, 36), g("d", 36, 46)]


def test_word_precision_writes_word_elements():
    out = write_predictions(
        PAGE, {"l0": ("ab cd", 0.9)}, positions={"l0": _positions()},
        output_precision="words",
    )
    root = ET.fromstring(out)
    line = next(root.iter(_q("TextLine")))
    words = line.findall(_q("Word"))
    assert [w.find(f"{_q('TextEquiv')}/{_q('Unicode')}").text for w in words] == ["ab", "cd"]
    # schema order: words directly after Coords, before the line TextEquiv
    children = [c.tag for c in line]
    assert children.index(_q("Word")) == children.index(_q("Coords")) + 1
    # bounding rect: line_x=100, line_y=50, word 'ab' spans ext 0..20
    pts = words[0].find(_q("Coords")).get("points")
    assert pts == "100,50 120,50 120,90 100,90"
    pts2 = words[1].find(_q("Coords")).get("points")
    assert pts2.startswith("126,50")
    # stale words deleted by default
    assert all(not (w.get("id") or "").endswith("_old") for w in words)
    assert len(words) == 2


def test_glyph_precision_writes_alternatives():
    out = write_predictions(
        PAGE, {"l0": ("ab cd", 0.9)}, positions={"l0": _positions()},
        output_precision="glyphs", max_glyph_alternatives=2,
    )
    root = ET.fromstring(out)
    word0 = next(root.iter(_q("Word")))
    glyphs = word0.findall(_q("Glyph"))
    assert [g.get("id") for g in glyphs] == ["l0_w1_g1", "l0_w1_g2"]
    # glyph 'a' has alternative 'o' at index 1
    equivs = glyphs[0].findall(_q("TextEquiv"))
    assert [e.find(_q("Unicode")).text for e in equivs] == ["a", "o"]
    assert [e.get("index") for e in equivs] == ["0", "1"]
    # word confidence = product of glyph top probabilities
    word_te = word0.find(_q("TextEquiv"))
    assert abs(float(word_te.get("conf")) - 0.81) < 1e-9


def test_old_words_renamed_when_not_deleting():
    out = write_predictions(
        PAGE, {"l0": ("ab cd", 0.9)}, positions={"l0": _positions()},
        output_precision="words", delete_old_words=False,
    )
    root = ET.fromstring(out)
    ids = [w.get("id") for w in root.iter(_q("Word"))]
    assert "w_old_1_old" in ids and "l0_w1" in ids


def test_lines_precision_unchanged():
    out = write_predictions(PAGE, {"l0": ("ab cd", 0.9)})
    root = ET.fromstring(out)
    words = list(root.iter(_q("Word")))
    assert [w.get("id") for w in words] == ["w_old_1"]  # untouched
    te = [t for t in next(root.iter(_q("TextLine"))).findall(_q("TextEquiv")) if t.get("index") == "1"]
    assert te and te[0].find(_q("Unicode")).text == "ab cd"


def test_store_pagexml_words_spark(spark):
    from calamari_spark.sources.pagexml import store_pagexml

    pages = spark.createDataFrame([("d0", PAGE)], "doc_id string, xml string")
    pos_type = (
        "array<struct<char:string, probability:double, global_start_ext:int,"
        " global_end_ext:int, alts:array<struct<char:string, probability:double>>>>"
    )
    rows = [
        (
            "d0",
            "l0",
            "ab cd",
            0.9,
            [
                (p["char"], p["probability"], p["global_start_ext"],
                 p["global_end_ext"], [(a["char"], a["probability"]) for a in p["alts"]])
                for p in _positions()
            ],
        )
    ]
    preds = spark.createDataFrame(
        rows,
        f"doc_id string, line_id string, sentence string, conf double, positions {pos_type}",
    )
    out = store_pagexml(pages, preds, output_precision="glyphs",
                        max_glyph_alternatives=2).collect()
    root = ET.fromstring(out[0]["xml"])
    words = list(root.iter(_q("Word")))
    assert [w.find(f"{_q('TextEquiv')}/{_q('Unicode')}").text for w in words] == ["ab", "cd"]
    glyphs = words[0].findall(_q("Glyph"))
    assert len(glyphs) == 2
