"""Minimal PDF writer + layout-aware text extractor (pure Python).

The north rule's extraction tier names "PDF/layout parse" alongside the
HTML boilerplate strip. No PDF library ships in this container, so — like
the pure-numpy PNG codec (`sources/pngio.py`) — the format is implemented
from the public spec (PDF 1.4, ISO 32000-1): an uncompressed single-page
document with one content stream of `BT … Td … Tj … ET` text objects, a
correct xref table and trailer.

The extractor is a genuine LAYOUT parse, not a stream echo: the writer
emits text objects in SCRAMBLED stream order (deterministic permutation),
and `extract_text` must reconstruct reading order from the glyph-placement
coordinates (y descending, then x ascending) — the same geometric sort a
real PDF text extractor performs, because PDF content streams carry no
required drawing order.

Spark-side, documents render to a `pdf` binary column and a separate
stage parses bytes back (`plans/textplans.q_pdf_extract`); the DuckDB
oracle rebuilds the expected line split with string ops only.
"""

from __future__ import annotations

import re
from typing import List, Tuple

PAGE_TOP_Y = 720
LINE_LEADING = 14
LEFT_X = 72


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            out.append(s[i + 1])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _pdf_string(s: str) -> str:
    """PDF text-string operand for ``s``: a Latin-1 literal string when the
    text is PDFDocEncoding-clean, else a UTF-16BE hex string with the
    FEFF BOM (ISO 32000-1 §7.9.2.2) — the spec's own mechanism for
    arbitrary Unicode. The old encode('latin-1', 'replace') silently
    mangled non-Latin-1 text to '?', which would have broken q_pdf_extract's
    oracle parity on any Unicode corpus (ADVICE r4)."""
    try:
        s.encode("latin-1")
    except UnicodeEncodeError:
        return "<FEFF" + s.encode("utf-16-be").hex().upper() + ">"
    return f"({_escape(s)})"


def _scramble(n: int) -> List[int]:
    """Deterministic permutation of range(n): odd indices first, then even,
    each group reversed — guarantees stream order != reading order for
    n >= 3, so a stream-order extractor fails the round-trip test."""
    idx = list(range(n))
    return list(reversed(idx[1::2])) + list(reversed(idx[0::2]))


def make_pdf(lines: List[str]) -> bytes:
    """A valid single-page PDF 1.4 showing ``lines`` top-to-bottom, with
    text objects written in scrambled stream order."""
    parts = []
    for i in _scramble(len(lines)):
        y = PAGE_TOP_Y - LINE_LEADING * i
        parts.append(
            f"BT /F1 12 Tf {LEFT_X} {y} Td {_pdf_string(lines[i])} Tj ET"
        )
    # strict: every non-Latin-1 character is already hex-escaped by
    # _pdf_string, so a failure here is a bug, not data
    content = "\n".join(parts).encode("latin-1")

    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for n, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(out)


_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_BT_RE = re.compile(r"BT(.*?)ET", re.S)
_TD_TJ_RE = re.compile(
    r"(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s+Td\s*"
    r"(?:\(((?:\\.|[^()\\])*)\)|<([0-9A-Fa-f\s]*)>)\s*Tj"
)


def _decode_hex_string(h: str) -> str:
    """PDF hex string -> text: UTF-16BE when it carries the FEFF BOM,
    else PDFDocEncoding (Latin-1 for our writer's subset)."""
    raw = bytes.fromhex("".join(h.split()))
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be")
    return raw.decode("latin-1")


def extract_text(pdf: bytes) -> List[str]:
    """Reading-order lines: collect every (x, y, text) glyph placement from
    every content stream's text objects, then sort geometrically (y desc,
    x asc) — stream order is untrusted by design."""
    placed: List[Tuple[float, float, str]] = []
    for m in _STREAM_RE.finditer(pdf):
        body = m.group(1).decode("latin-1")
        for bt in _BT_RE.finditer(body):
            for tm in _TD_TJ_RE.finditer(bt.group(1)):
                x, y = float(tm.group(1)), float(tm.group(2))
                lit, hx = tm.group(3), tm.group(4)
                text = _unescape(lit) if lit is not None else _decode_hex_string(hx)
                placed.append((x, y, text))
    placed.sort(key=lambda p: (-p[1], p[0]))
    return [t for _, _, t in placed]
