"""Abbyy FineReader XML container support (read-only scan).

Re-derivation of the reference's Abbyy reader semantics
(reference: calamari_ocr/ocr/dataset/datareader/abbyy/reader.py:29-158,
XML model abbyy/xml/data.py:1-332): document -> page -> block(Text) ->
text -> par -> line, each line carrying a (l, t, r, b) rect and its text
(charParams concatenated, or the line's accumulated text). Emits the same
row shape as the PAGE-XML scan so downstream stages are shared.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_abbyy(xml_str: str) -> List[dict]:
    """One Abbyy XML document -> ordered line rows
    (line_id, region_id, order, rect l/t/r/b, text)."""
    root = ET.fromstring(xml_str)
    out: List[dict] = []
    order = 0
    page_no = 0
    for page in (el for el in root.iter() if _local(el.tag) == "page"):
        block_no = 0
        for block in (el for el in page if _local(el.tag) == "block"):
            if block.get("blockType", "Text") != "Text":
                continue
            for line in (el for el in block.iter() if _local(el.tag) == "line"):
                chars = [
                    (cp.text or "")
                    for cp in line.iter()
                    if _local(cp.tag) == "charParams"
                ]
                text = "".join(chars)
                if not text:
                    text = "".join(line.itertext()).strip()
                out.append(
                    {
                        "line_id": f"p{page_no}_b{block_no}_l{order}",
                        "region_id": f"p{page_no}_b{block_no}",
                        "order": order,
                        "l": int(line.get("l", 0)),
                        "t": int(line.get("t", 0)),
                        "r": int(line.get("r", 0)),
                        "b": int(line.get("b", 0)),
                        "text": text,
                    }
                )
                order += 1
            block_no += 1
        page_no += 1
    return out


ABBYY_LINES_SCHEMA = (
    "doc_id string, line_id string, region_id string, `order` int,"
    " l int, t int, r int, b int, text string"
)


def read_abbyy(pages: DataFrame) -> DataFrame:
    """(doc_id, xml) -> one row per line, parsed in parallel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, xml_str in zip(batch["doc_id"], batch["xml"]):
                for r in parse_abbyy(xml_str):
                    rows.append({"doc_id": doc_id, **r})
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "line_id", "region_id", "order",
                         "l", "t", "r", "b", "text"],
            )

    return pages.mapInPandas(run, schema=ABBYY_LINES_SCHEMA)


def cutout_rect(img, l: int, t: int, r: int, b: int):
    """Cut a line rect out of a page image (reference: abbyy rect cut)."""
    return img[max(0, t) : b, max(0, l) : r]


def write_predictions_abbyy(xml_str: str, predictions: dict) -> str:
    """Write predicted sentences back per line (reference:
    abbyy/xml/writer.py:1-87): each predicted line's content is replaced by
    one formatting element holding the sentence. Keyed by the same
    line_id scheme the reader emits."""
    root = ET.fromstring(xml_str)
    ns = root.tag.split("}")[0].strip("{") if "}" in root.tag else ""
    order = 0
    page_no = 0
    for page in (el for el in root.iter() if _local(el.tag) == "page"):
        block_no = 0
        for block in (el for el in page if _local(el.tag) == "block"):
            if block.get("blockType", "Text") != "Text":
                continue
            for line in (el for el in block.iter() if _local(el.tag) == "line"):
                lid = f"p{page_no}_b{block_no}_l{order}"
                order += 1
                if lid not in predictions:
                    continue
                for child in list(line):
                    line.remove(child)
                # a plain-text line stores its content in the element's own
                # text node, not in children — clear it too or the old text
                # survives the rewrite prepended to the prediction (caught
                # by x_abbyy_roundtrip's cross-engine hash)
                line.text = None
                tag = f"{{{ns}}}formatting" if ns else "formatting"
                fmt = ET.SubElement(line, tag)
                fmt.text = predictions[lid]
            block_no += 1
        page_no += 1
    return ET.tostring(root, encoding="unicode")


def store_abbyy(pages, predictions):
    """(doc_id, xml) x (doc_id, line_id, sentence) -> rewritten XML per doc
    (same reassembly shape as store_pagexml)."""
    import pandas as pd
    from pyspark.sql import functions as F

    per_doc = predictions.groupBy("doc_id").agg(
        F.collect_list(F.struct("line_id", "sentence")).alias("preds")
    )
    joined = pages.join(per_doc, "doc_id", "left")

    def run(batches):
        for b in batches:
            rows = []
            for doc_id, xml_str, preds in zip(b["doc_id"], b["xml"], b["preds"]):
                pmap = {p["line_id"]: p["sentence"]
                        for p in (preds if preds is not None else [])}
                rows.append({"doc_id": doc_id,
                             "xml": write_predictions_abbyy(xml_str, pmap)})
            yield pd.DataFrame(rows, columns=["doc_id", "xml"])

    return joined.mapInPandas(run, schema="doc_id string, xml string")
