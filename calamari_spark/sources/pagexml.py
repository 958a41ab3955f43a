"""PAGE-XML container support (read lines + coords, write predictions back).

Re-derivation of the reference's PageXML dataset reader/writer semantics
(reference: calamari_ocr/ocr/dataset/datareader/pagexml/reader.py:46-178
scan, :398-429 + :540-628 store-back) on the public PAGE-XML standard
(PRImA PcGts). The Spark shape: XML strings are rows of a DataFrame; the
parse runs inside ``mapInPandas`` so a million pages parse in parallel,
and the store-back is a ``groupBy(doc).collect_list`` + single rewrite per
page — order restored by the line's reading order, not arrival order
(removing the reference's sequential-store constraint,
reader.py:425-429, 630-634).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Dict, Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NS = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"


def _q(tag: str) -> str:
    return f"{{{NS}}}{tag}"


# ---------------------------------------------------------------------------
# driver-side single-page parse/write (pure functions; UDFs wrap these)
# ---------------------------------------------------------------------------

def parse_page(xml_str: str, skip_commented: bool = False) -> List[dict]:
    """One PAGE-XML document -> ordered line rows
    (line_id, region_id, order, coords, text). Lines whose region or line
    id is commented out are skipped when ``skip_commented``
    (reference: pagexml/reader.py:106-107)."""
    root = ET.fromstring(xml_str)
    out: List[dict] = []
    order = 0
    for region in root.iter(_q("TextRegion")):
        region_id = region.get("id", "")
        # region orientation drives the deskew rotation at cutout time
        # (reference: reader.py:128, :666 — textline.getparent().orientation)
        orientation = float(region.get("orientation", "0"))
        for line in region.findall(_q("TextLine")):
            if skip_commented and line.get("comments"):
                continue
            coords_el = line.find(_q("Coords"))
            coords = coords_el.get("points", "") if coords_el is not None else ""
            text = None
            # lowest TextEquiv index wins (reference: reader.py:95-119)
            best_index = None
            for te in line.findall(_q("TextEquiv")):
                idx = int(te.get("index", "0"))
                uni = te.find(_q("Unicode"))
                if uni is not None and (best_index is None or idx < best_index):
                    best_index = idx
                    text = uni.text or ""
            out.append(
                {
                    "line_id": line.get("id", f"l{order}"),
                    "region_id": region_id,
                    "order": order,
                    "coords": coords,
                    "orientation": orientation,
                    "text": text,
                }
            )
            order += 1
    return out


def _rect_points(x, y, w, h) -> str:
    return f"{int(x)},{int(y)} {int(x + w)},{int(y)} {int(x + w)},{int(y + h)} {int(x)},{int(y + h)}"


def _words_from_positions(positions: List[dict]) -> List[List[dict]]:
    """Group per-glyph positions into words at space glyphs (reference:
    pagexml/reader.py:612-628)."""
    words: List[List[dict]] = []
    cur: List[dict] = []
    for pos in positions:
        if pos["char"] == " ":
            words.append(cur)
            cur = []
            continue
        cur.append(pos)
    if cur:
        words.append(cur)
    return words


def _store_words(line, line_id: str, coords: str, positions: List[dict],
                 precision: str, max_glyph_alternatives: int,
                 output_confidences: bool, delete_old_words: bool) -> None:
    """Word (and optionally Glyph) elements with bounding rects derived
    from the glyph extents (reference: pagexml/reader.py:507-609)."""
    # delete or _old-rename existing words (reader.py:492-505)
    for w in list(line.findall(_q("Word"))):
        if delete_old_words:
            line.remove(w)
        else:
            w.set("id", f"{w.get('id')}_old")
            for g in w.findall(_q("Glyph")):
                g.set("id", f"{g.get('id')}_old")

    # words go right after Baseline/Coords (schema order, reader.py:540-556)
    children = list(line)
    insert_index = 0
    for i, ch in enumerate(children):
        if ch.tag in (_q("Coords"), _q("Baseline")):
            insert_index = i + 1

    x0, y0, x1, y1 = coords_to_box(coords)
    line_x, line_y, line_h = x0, y0, (y1 - 1) - y0

    for wi, word in enumerate(w for w in _words_from_positions(positions) if w):
        word_id = f"{line_id}_w{wi + 1}"
        word_xml = ET.Element(_q("Word"), {"id": word_id})
        coords_xml = ET.SubElement(word_xml, _q("Coords"))
        word_text = ""
        word_conf = 1.0
        for gi, glyph in enumerate(word):
            word_text += glyph["char"]
            word_conf *= glyph["probability"]
            if precision == "glyphs":
                g = ET.SubElement(word_xml, _q("Glyph"), {"id": f"{word_id}_g{gi + 1}"})
                gc = ET.SubElement(g, _q("Coords"))
                gc.set("points", _rect_points(
                    glyph["global_start_ext"] + line_x, line_y,
                    glyph["global_end_ext"] - glyph["global_start_ext"], line_h,
                ))
                raw_alts = glyph.get("alts")
                raw_alts = [] if raw_alts is None else list(raw_alts)
                alts = [(glyph["char"], glyph["probability"])] + [
                    (a["char"], a["probability"]) for a in raw_alts
                ]
                for ai, (ch_, p_) in enumerate(alts[:max_glyph_alternatives]):
                    te = ET.SubElement(g, _q("TextEquiv"), {"index": str(ai)})
                    if output_confidences:
                        te.set("conf", str(p_))
                    ET.SubElement(te, _q("Unicode")).text = ch_
        te = ET.SubElement(word_xml, _q("TextEquiv"), {"index": "0"})
        if output_confidences:
            te.set("conf", str(word_conf))
        ET.SubElement(te, _q("Unicode")).text = word_text
        coords_xml.set("points", _rect_points(
            word[0]["global_start_ext"] + line_x, line_y,
            word[-1]["global_end_ext"] - word[0]["global_start_ext"], line_h,
        ))
        line.insert(insert_index, word_xml)
        insert_index += 1


def write_predictions(
    xml_str: str,
    predictions: Dict[str, Tuple[str, float]],
    positions: Optional[Dict[str, List[dict]]] = None,
    output_precision: str = "lines",
    max_glyph_alternatives: int = 1,
    output_confidences: bool = True,
    delete_old_words: bool = True,
) -> str:
    """Insert predicted sentences (and confidence) into each TextLine's
    TextEquiv[index=1]/Unicode, mirroring the reference's store-back
    (reference: pagexml/reader.py:398-429). With output_precision 'words'
    or 'glyphs' (and per-line glyph ``positions``), Word/Glyph elements with
    extent-derived bounding rects are written too (reader.py:507-609)."""
    ET.register_namespace("", NS)
    root = ET.fromstring(xml_str)
    for line in root.iter(_q("TextLine")):
        lid = line.get("id")
        if lid not in predictions:
            continue
        sentence, conf = predictions[lid]
        # drop any existing index=1 equiv, then append ours
        for te in list(line.findall(_q("TextEquiv"))):
            if te.get("index") == "1":
                line.remove(te)
        te = ET.SubElement(line, _q("TextEquiv"))
        te.set("index", "1")
        te.set("conf", f"{conf:.4f}")
        uni = ET.SubElement(te, _q("Unicode"))
        uni.text = sentence
        if output_precision in ("words", "glyphs") and positions and lid in positions:
            coords_el = line.find(_q("Coords"))
            coords = coords_el.get("points", "") if coords_el is not None else ""
            _store_words(
                line, lid, coords, positions[lid], output_precision,
                max_glyph_alternatives, output_confidences, delete_old_words,
            )
    return ET.tostring(root, encoding="unicode")


def coords_to_box(coords: str) -> Tuple[int, int, int, int]:
    """Polygon points -> minimal bounding rect (x0, y0, x1, y1) — the 'box'
    cut mode (reference: pagexml/reader.py:283-391)."""
    pts = [tuple(int(v) for v in p.split(",")) for p in coords.split() if "," in p]
    if not pts:
        return (0, 0, 0, 0)
    xs, ys = [p[0] for p in pts], [p[1] for p in pts]
    return (min(xs), min(ys), max(xs) + 1, max(ys) + 1)


def cutout_box(img, coords: str):
    """Cut the axis-aligned bounding region of a polygon out of a page
    image (numpy). Polygon masking + rotation live in
    calamari_spark.operators.cutout.cutout (the full reference semantics)."""
    x0, y0, x1, y1 = coords_to_box(coords)
    return img[max(0, y0) : y1, max(0, x0) : x1]


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

PAGE_LINES_SCHEMA = (
    "doc_id string, line_id string, region_id string, `order` int,"
    " coords string, orientation double, text string"
)

_PAGE_LINE_COLS = [
    "doc_id", "line_id", "region_id", "order", "coords", "orientation", "text"
]


def read_pagexml(pages: DataFrame, skip_commented: bool = False) -> DataFrame:
    """(doc_id, xml) -> one row per text line, parsed in parallel.
    ``skip_commented`` drops lines carrying a ``comments`` attribute
    (reference: pagexml/reader.py:106-107)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, xml_str in zip(b["doc_id"], b["xml"]):
                for r in parse_page(xml_str, skip_commented=skip_commented):
                    rows.append({"doc_id": doc_id, **r})
            yield pd.DataFrame(rows, columns=_PAGE_LINE_COLS)

    return pages.mapInPandas(run, schema=PAGE_LINES_SCHEMA)


def cutout_lines(pages_with_png: DataFrame, cut_mode: str = "polygon") -> DataFrame:
    """(doc_id, xml, png) pages -> one row per line with the line image cut
    out of the page (polygon-masked, deskewed by the region orientation) and
    re-encoded as PNG — the reference's load path (reader.py:655-688) as one
    mapInPandas stage. The page image decodes ONCE per page per batch and
    serves all its lines; downstream OCR shuffles only the (small) line
    crops, never the page scans."""
    from calamari_spark.operators.cutout import CutMode, cutout
    from calamari_spark.sources.pngio import decode_png, encode_png

    mode = {"box": CutMode.BOX, "polygon": CutMode.POLYGON, "mbr": CutMode.MBR}[cut_mode]
    schema = PAGE_LINES_SCHEMA + ", line_png binary, line_w int, line_h int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, xml_str, png in zip(b["doc_id"], b["xml"], b["png"]):
                img = decode_png(bytes(png))
                for r in parse_page(xml_str):
                    # rotate by orientation angle in clockwise direction to
                    # correct present skew (reference: reader.py:666-667)
                    o = r["orientation"]
                    angle = o if o and o % 360 != 0 else 0
                    line_img = cutout(img, r["coords"], mode=mode, angle=angle)
                    rows.append(
                        {
                            "doc_id": doc_id,
                            **r,
                            "line_png": encode_png(line_img),
                            "line_w": int(line_img.shape[1]) if line_img.ndim == 2 else 0,
                            "line_h": int(line_img.shape[0]),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=_PAGE_LINE_COLS + ["line_png", "line_w", "line_h"]
            )

    return pages_with_png.mapInPandas(run, schema=schema)


def store_pagexml(pages: DataFrame, predictions: DataFrame,
                  output_precision: str = "lines",
                  max_glyph_alternatives: int = 1) -> DataFrame:
    """(doc_id, xml) x (doc_id, line_id, sentence, conf[, positions]) ->
    (doc_id, xml) with predictions written back. One groupBy(doc_id)
    gathers each page's predictions; the page XML joins in and is rewritten
    once. With output_precision 'words'/'glyphs' the predictions DF must
    carry a ``positions`` column (the recognize stage's nested tree)."""
    has_positions = "positions" in predictions.columns
    cols = ["line_id", "sentence", "conf"] + (["positions"] if has_positions else [])
    per_doc = predictions.groupBy("doc_id").agg(
        F.collect_list(F.struct(*cols)).alias("preds")
    )
    joined = pages.join(per_doc, "doc_id", "left")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, xml_str, preds in zip(b["doc_id"], b["xml"], b["preds"]):
                preds = preds if preds is not None else []
                pmap = {
                    p["line_id"]: (p["sentence"], float(p["conf"])) for p in preds
                }
                pos = None
                if has_positions and output_precision in ("words", "glyphs"):
                    pos = {
                        p["line_id"]: [
                            dict(g.asDict()) if hasattr(g, "asDict") else dict(g)
                            for g in (
                                [] if p["positions"] is None else list(p["positions"])
                            )
                        ]
                        for p in preds
                    }
                rows.append(
                    {
                        "doc_id": doc_id,
                        "xml": write_predictions(
                            xml_str, pmap, positions=pos,
                            output_precision=output_precision,
                            max_glyph_alternatives=max_glyph_alternatives,
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "xml"])

    return joined.mapInPandas(run, schema="doc_id string, xml string")
