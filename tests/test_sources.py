"""PNG codec, glyph font, and synthetic corpus determinism tests."""

import numpy as np

from calamari_spark.sources.font import glyph, render_line
from calamari_spark.sources.pngio import decode_png, encode_png
from calamari_spark.sources.synth import gen_document


def test_png_roundtrip():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(37, 211), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_deterministic():
    img = np.arange(0, 255, dtype=np.uint8).reshape(15, 17)
    assert encode_png(img) == encode_png(img.copy())


def test_glyphs_distinct_and_deterministic():
    gs = {c: glyph(c).tobytes() for c in "abcdefgh XYZ.,'"}
    assert len(set(gs.values())) == len(gs)
    assert glyph("a").tobytes() == glyph("a").tobytes()


def test_render_line_shape_and_ink():
    img = render_line("hello world", warp_amp=2.0)
    assert img.dtype == np.uint8
    assert img.min() == 0 and img.max() == 255  # ink + paper present
    assert img.shape[0] >= 24


def test_gen_document_deterministic_and_ordered():
    d1 = gen_document(42, "t")
    d2 = gen_document(42, "t")
    assert d1[0] == d2[0] == "doc_000000042"
    assert [s["offset"] for s in d1[1]] == list(range(len(d1[1])))
    assert [s for s in d1[1]] == [s for s in d2[1]]
    pngs1 = [m["png"] for m in d1[2]]
    pngs2 = [m["png"] for m in d2[2]]
    assert pngs1 == pngs2
    for s in d1[1]:
        if s["kind"] == "media":
            assert s["text"] is None and s["media_ref"] is not None
        else:
            assert s["media_ref"] is None and s["text"] is not None


def test_generate_corpus_spark(spark):
    from calamari_spark.sources.synth import generate_corpus

    docs, media = generate_corpus(spark, 30, corpus="unit", skew_tail=False, partitions=4)
    dc = docs.count()
    assert dc == 30
    m = media.limit(5).collect()
    assert all(r["png"][:4] == b"\x89PNG"[:4] for r in m)
