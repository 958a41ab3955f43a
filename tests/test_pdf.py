"""Pure-Python PDF writer/extractor (sources/pdf.py): round-trip fidelity,
layout-sort correctness against scrambled stream order, and structural
validity (xref offsets)."""

import re

from calamari_spark.sources.pdf import (
    PAGE_TOP_Y,
    _scramble,
    extract_text,
    make_pdf,
)


def test_roundtrip_with_escaping():
    lines = [
        "plain words",
        "parens (nested) and \\ backslash",
        "close ) open ( mixed",
    ]
    assert extract_text(make_pdf(lines)) == lines


def test_reading_order_is_reconstructed_from_layout_not_stream_order():
    lines = [f"line number {i}" for i in range(7)]
    pdf = make_pdf(lines)
    # the content stream's textual order differs from reading order...
    body = re.search(rb"stream\r?\n(.*?)\r?\nendstream", pdf, re.S).group(1)
    stream_lines = re.findall(rb"\(([^)]*)\) Tj", body)
    assert [s.decode() for s in stream_lines] != lines
    # ...but extraction restores it via the (y desc, x asc) sort
    assert extract_text(pdf) == lines


def test_scramble_never_identity_for_3_plus():
    for n in range(3, 40):
        p = _scramble(n)
        assert sorted(p) == list(range(n)) and p != list(range(n))


def test_single_and_empty_line():
    assert extract_text(make_pdf(["only line"])) == ["only line"]
    assert extract_text(make_pdf([""])) == [""]
    assert extract_text(make_pdf([])) == []


def test_xref_offsets_point_at_objects():
    pdf = make_pdf(["a", "b", "c"])
    m = re.search(rb"xref\n0 (\d+)\n(.*?)trailer", pdf, re.S)
    n = int(m.group(1))
    entries = m.group(2).splitlines()
    assert len(entries) == n
    for i, entry in enumerate(entries[1:], start=1):  # skip the free head
        off = int(entry[:10])
        assert pdf[off:].startswith(b"%d 0 obj" % i)
    # startxref points at the xref table
    sx = int(re.search(rb"startxref\n(\d+)\n", pdf).group(1))
    assert pdf[sx:].startswith(b"xref")


def test_y_coordinates_descend_with_line_index():
    pdf = make_pdf(["first", "second"])
    body = re.search(rb"stream\r?\n(.*?)\r?\nendstream", pdf, re.S).group(1).decode()
    coords = {
        m.group(3): float(m.group(2))
        for m in re.finditer(r"(\d+) (\d+) Td \(([^)]*)\) Tj", body)
    }
    assert coords["first"] == PAGE_TOP_Y
    assert coords["second"] < coords["first"]
