"""Oracled round-trip queries for the two XML container formats.

Round 4 left the PAGE-XML / Abbyy scans pytest-only except the cutout
geometry; these queries put the full parse -> predict -> store-back ->
reparse cycle under the driver-exact cross-engine compare. Pages are
SYNTHESIZED deterministically from the `documents` table (8-word lines,
the q_pdf_extract split), so the DuckDB oracle reconstructs every expected
value with string ops — no golden fixture needed, and any change to the
TextEquiv index rules, the commented-line skip, the store-back layout, or
the Abbyy charParams/itertext precedence breaks the hash.

Reference semantics attested:
* PAGE-XML lowest-TextEquiv-index-wins (pagexml/reader.py:95-119) — every
  synthesized line carries a decoy index=2 equiv, and after store-back an
  index=1 prediction equiv; the reparse must still pick index=0.
* skip_commented (reader.py:106-107) — a commented decoy line leads each
  region; with the skip it must vanish WITHOUT shifting line numbering.
* store-back (reader.py:398-429) — prediction + conf written to
  TextEquiv[index=1], read back exactly (conf values are k/16: exact in
  binary and at the writer's 4-decimal format).
* Abbyy block/line scan (abbyy/reader.py:29-158) — non-Text blocks
  skipped, charParams concatenation preferred over itertext, (l,t,r,b)
  rects carried through; store-back replaces line content with one
  formatting element (abbyy/xml/writer.py:1-87).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calamari_spark.functions.text import REG_SPACES_SQL as _REG_SQL
from calamari_spark.functions.text import regularized_spaces_col as _regularized_col
from calamari_spark.plans.docsplit import WORDS_PER_LINE, lines_col, lines_cte
from calamari_spark.sources.tables import load_table


def _doc_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lines array<string>): regularized text split into 8-word
    lines — the deterministic page content both containers render.

    Empty-text documents are excluded (mirrored by the WHERE in
    _LINES_CTE): an empty doc would render one empty line, and the Abbyy
    rescan's itertext().strip() reads the stored 'PRED: ' back as 'PRED:'
    while the string oracle keeps the trailing space — a latent
    cross-engine mismatch on any corpus containing a blank document."""
    from calamari_spark.plans.common import fan_out

    docs = load_table(spark, "documents", sf_dir).filter(
        F.length(_regularized_col(F.col("text"))) > 0
    )
    w = F.split(_regularized_col(F.col("text")), " ")
    # fan_out: XML render + two parse passes are the per-row kernels
    return fan_out(docs, "doc_id").select(
        "doc_id", lines_col(w).alias("lines")
    )


_LINES_CTE = lines_cte(_REG_SQL, where=f"length({_REG_SQL}) > 0")


# ---------------------------------------------------------------------------
# PAGE-XML
# ---------------------------------------------------------------------------

def _render_pagexml(doc_id: int, lines: list) -> str:
    from xml.sax.saxutils import escape

    from calamari_spark.sources.pagexml import NS

    tl = [
        # decoy FIRST: if skip_commented were ignored, every line_no below
        # would shift by one and the oracle hash would break
        '<TextLine id="decoy" comments="struck through">'
        '<Coords points="0,0 1,0 1,1 0,1"/>'
        '<TextEquiv index="0"><Unicode>DECOY</Unicode></TextEquiv></TextLine>'
    ]
    for i, line in enumerate(lines):
        y0, y1 = 10 + 20 * i, 10 + 20 * i + 18
        tl.append(
            f'<TextLine id="doc{doc_id}_l{i}">'
            f'<Coords points="5,{y0} 400,{y0} 400,{y1} 5,{y1}"/>'
            # decoy equiv with a HIGHER index: lowest must win at parse
            f'<TextEquiv index="2"><Unicode>WRONG {i}</Unicode></TextEquiv>'
            f'<TextEquiv index="0"><Unicode>{escape(line)}</Unicode></TextEquiv>'
            f"</TextLine>"
        )
    return (
        f'<?xml version="1.0"?><PcGts xmlns="{NS}"><Page>'
        f'<TextRegion id="r0" orientation="0">{"".join(tl)}</TextRegion>'
        f"</Page></PcGts>"
    )


def x_pagexml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE-XML parse -> predict -> store-back -> reparse, per document."""
    from calamari_spark.sources.pagexml import read_pagexml, store_pagexml

    src = _doc_lines(spark, sf_dir)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            # container schemas key docs by string id (PAGE_LINES_SCHEMA)
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"].astype(str),
                    "xml": [
                        _render_pagexml(d, list(ls))
                        for d, ls in zip(b["doc_id"], b["lines"])
                    ],
                }
            )

    pages = src.mapInPandas(render, "doc_id string, xml string")

    parsed = read_pagexml(pages, skip_commented=True)
    preds = parsed.select(
        "doc_id",
        "line_id",
        F.concat(F.lit("PRED: "), F.col("text")).alias("sentence"),
        (F.pmod(F.col("order"), F.lit(8)) / 16.0 + 0.5).alias("conf"),
    )
    stored = store_pagexml(pages, preds)

    out_schema = (
        "doc_id long, line_no int, gt_text string, pred_text string, conf double"
    )

    def reparse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from calamari_spark.sources.pagexml import _q, parse_page

        import xml.etree.ElementTree as ET

        for b in batches:
            rows = []
            for doc_id, xml_str in zip(b["doc_id"], b["xml"]):
                # index-1 prediction equivs, keyed by line id
                pred = {}
                for line in ET.fromstring(xml_str).iter(_q("TextLine")):
                    for te in line.findall(_q("TextEquiv")):
                        if te.get("index") == "1":
                            uni = te.find(_q("Unicode"))
                            pred[line.get("id")] = (
                                (uni.text or "") if uni is not None else "",
                                float(te.get("conf")),
                            )
                # lowest index must STILL win post-store (0 beats 1 and 2)
                for r in parse_page(xml_str, skip_commented=True):
                    p = pred.get(r["line_id"], ("", float("nan")))
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "line_no": r["order"],
                            "gt_text": r["text"],
                            "pred_text": p[0],
                            "conf": p[1],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "line_no", "gt_text", "pred_text", "conf"],
            )

    return stored.mapInPandas(reparse, out_schema).orderBy("doc_id", "line_no")


X_PAGEXML_ROUNDTRIP_SQL = f"""
SELECT doc_id, line_no,
       line AS gt_text,
       'PRED: ' || line AS pred_text,
       (line_no % 8) / 16.0 + 0.5 AS conf
FROM ({_LINES_CTE})
ORDER BY doc_id, line_no
"""


# ---------------------------------------------------------------------------
# Abbyy
# ---------------------------------------------------------------------------

def _render_abbyy(doc_id: int, lines: list) -> str:
    from xml.sax.saxutils import escape

    parts = [
        "<document><page>",
        # decoy non-Text block: the scan must skip it entirely
        '<block blockType="Picture"><text><par>'
        '<line l="0" t="0" r="1" b="1">DECOY</line></par></text></block>',
        '<block blockType="Text"><text><par>',
    ]
    for i, line in enumerate(lines):
        l, t = 10 * (i + 1), 50 * i
        r, b = l + 8 * len(line), t + 40
        if i == 0:
            # charParams concatenation takes precedence over itertext
            body = "".join(
                f"<charParams>{escape(c)}</charParams>" for c in line
            )
        else:
            body = escape(line)
        parts.append(f'<line l="{l}" t="{t}" r="{r}" b="{b}">{body}</line>')
    parts.append("</par></text></block></page></document>")
    return "".join(parts)


def x_abbyy_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abbyy scan -> predict -> store-back -> rescan, per document."""
    from calamari_spark.sources.abbyy import read_abbyy, store_abbyy

    src = _doc_lines(spark, sf_dir)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"].astype(str),
                    "xml": [
                        _render_abbyy(d, list(ls))
                        for d, ls in zip(b["doc_id"], b["lines"])
                    ],
                }
            )

    pages = src.mapInPandas(render, "doc_id string, xml string")

    parsed = read_abbyy(pages)
    preds = parsed.select(
        "doc_id",
        "line_id",
        F.concat(F.lit("PRED: "), F.col("text")).alias("sentence"),
    )
    stored = store_abbyy(pages, preds)
    # rescan: stored lines have no charParams left, so the itertext branch
    # must surface exactly the written prediction
    rescanned = read_abbyy(stored).select(
        "doc_id",
        F.col("order").alias("line_no"),
        F.col("text").alias("stored_text"),
        "l",
        "t",
        "r",
        "b",
    )
    gt = parsed.select(
        "doc_id", F.col("order").alias("line_no"), F.col("text").alias("gt_text")
    )
    return (
        gt.join(rescanned, ["doc_id", "line_no"])
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "line_no", "gt_text", "stored_text", "l", "t", "r", "b",
        )
        .orderBy("doc_id", "line_no")
    )


X_ABBYY_ROUNDTRIP_SQL = f"""
SELECT doc_id, line_no,
       line AS gt_text,
       'PRED: ' || line AS stored_text,
       10 * (line_no + 1) AS l,
       50 * line_no AS t,
       10 * (line_no + 1) + 8 * length(line) AS r,
       50 * line_no + 40 AS b
FROM ({_LINES_CTE})
ORDER BY doc_id, line_no
"""


CONTAINER_SHADOW_QUERIES = {
    "x_pagexml_roundtrip": (x_pagexml_roundtrip, X_PAGEXML_ROUNDTRIP_SQL),
    "x_abbyy_roundtrip": (x_abbyy_roundtrip, X_ABBYY_ROUNDTRIP_SQL),
}
