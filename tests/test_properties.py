"""Property-based tests (hypothesis) for the pure operator kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from calamari_spark.codec import Codec
from calamari_spark.functions.text import regularize_str
from calamari_spark.operators.ctc import greedy_labels
from calamari_spark.operators.imaging import scale_to_h, to_uint8
from calamari_spark.operators.synchronize import synchronize
from calamari_spark.sources.pngio import decode_png, encode_png

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x201F,
                           exclude_categories=("Cc", "Cs")),
    max_size=80,
)


@given(st.integers(1, 40), st.integers(1, 60), st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_exact(h, w, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@given(TEXT)
@settings(max_examples=80, deadline=None)
def test_codec_roundtrip(s):
    chars = sorted(set(s))
    if not chars:
        return
    codec = Codec(chars)
    labels = codec.encode(s)
    assert "".join(codec.decode(labels)) == s
    assert all(l > 0 for l in labels)  # blank 0 never encodes


@given(TEXT, TEXT)
@settings(max_examples=50, deadline=None)
def test_codec_extend_then_encode_total(a, b):
    codec = Codec(sorted(set(a)) or ["x"])
    codec.extend(sorted(set(b)))
    assert "".join(codec.decode(codec.encode(b))) == b


@given(TEXT)
@settings(max_examples=80, deadline=None)
def test_spaces_regularizer_idempotent(s):
    once = regularize_str(s, rulesets=["spaces"])
    assert regularize_str(once, rulesets=["spaces"]) == once
    assert "  " not in once and not once.startswith(" ") and not once.endswith(" ")


@given(st.text(alphabet="abcd", max_size=25), st.text(alphabet="abcd", max_size=25))
@settings(max_examples=80, deadline=None)
def test_synchronize_matched_regions_equal(a, b):
    segs = synchronize([a, b])
    # matched segments carry identical substrings; boundaries are monotonic
    last_stop = [-1, -1]
    for seg in segs:
        for i in range(2):
            assert seg.starts[i] >= last_stop[i] + 1 - 0  # non-overlapping
            last_stop[i] = seg.stops[i]
        if seg.match:
            assert a[seg.starts[0] : seg.stops[0] + 1] == b[seg.starts[1] : seg.stops[1] + 1]


@given(st.integers(0, 2**32 - 1), st.integers(2, 30), st.integers(2, 8))
@settings(max_examples=60, deadline=None)
def test_greedy_labels_properties(seed, t, c):
    rng = np.random.RandomState(seed)
    p = rng.rand(t, c).astype(np.float32)
    p /= p.sum(axis=1, keepdims=True)
    out = greedy_labels(p, blank=0)
    arg = np.argmax(p, axis=1)
    # no blanks, labels in range, frame ranges tile the argmax runs
    assert all(0 < l < c for l, _, _ in out)
    for l, s, e in out:
        assert s < e and (arg[s:e] == l).all()
    # adjacent emissions never share a label AND a shared boundary
    for (l1, _, e1), (l2, s2, _) in zip(out, out[1:]):
        assert not (l1 == l2 and e1 == s2)


@given(st.integers(1, 80), st.integers(1, 80), st.integers(4, 64))
@settings(max_examples=40, deadline=None)
def test_scale_to_h_invariants(h, w, target):
    img = np.full((h, w), 128, dtype=np.uint8)
    out = scale_to_h(img, target)
    assert out.shape[0] == target
    assert out.shape[1] == max(1, round(target / h * w))
    assert int(out.min()) == int(out.max()) == 128  # constant stays constant


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_to_uint8_range(seed):
    rng = np.random.RandomState(seed)
    for arr in (rng.rand(5, 5), rng.rand(5, 5).astype(np.float32),
                rng.randint(-128, 128, (5, 5), dtype=np.int8),
                rng.randint(0, 65535, (5, 5), dtype=np.uint16)):
        out = to_uint8(arr)
        assert out.dtype == np.uint8


@given(st.integers(0, 2**32 - 1), st.integers(2, 5), st.integers(2, 4))
@settings(max_examples=30, deadline=None)
def test_ctc_loss_equals_brute_force(seed, T, n_labels):
    """Forward-algorithm NLL == -log(sum over all collapsing paths)."""
    import itertools
    import math

    from calamari_spark.operators.ctc_loss import ctc_loss

    rng = np.random.RandomState(seed)
    C = 4
    sm = rng.dirichlet(np.ones(C), size=T)
    labels = list(rng.randint(1, C, size=n_labels))

    def collapse(path):
        out, prev = [], None
        for p in path:
            if p != 0 and p != prev:
                out.append(p)
            prev = p
        return out

    total = 0.0
    for path in itertools.product(range(C), repeat=T):
        if collapse(path) == labels:
            p = 1.0
            for t, c in enumerate(path):
                p *= sm[t, c]
            total += p
    expected = -math.log(total) if total > 0 else float("inf")
    got = ctc_loss(sm, labels)
    if expected == float("inf"):
        assert got == float("inf")
    else:
        assert abs(got - expected) < 1e-9 * max(1.0, abs(expected))


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_cutout_box_mode_equals_numpy_slice(seed):
    from calamari_spark.operators.cutout import CutMode, cutout

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (40, 60), dtype=np.uint8)
    x0, y0 = rng.randint(0, 30), rng.randint(0, 20)
    x1, y1 = x0 + rng.randint(1, 20), y0 + rng.randint(1, 15)
    coords = f"{x0},{y0} {x1},{y0} {x1},{y1} {x0},{y1}"
    cut = cutout(img, coords, mode=CutMode.BOX)
    assert np.array_equal(cut, img[y0 : y1 + 1, x0 : x1 + 1])


@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=4), min_size=1, max_size=12))
@settings(max_examples=50, deadline=None)
def test_wordlm_unigrams_sum_to_one(words):
    from calamari_spark.operators.ctc import WordLM

    lm = WordLM(" ".join(words), "abcd ", "abcd")
    total = sum(lm.unigram(w) for w in set(w.lower() for w in words))
    assert abs(total - 1.0) < 1e-9
    # every corpus word is in the dictionary
    assert all(lm.is_word(w) for w in words)


@given(st.integers(0, 2**32 - 1), st.integers(1, 10))
@settings(max_examples=20, deadline=None)
def test_augment_variant_deterministic(seed, variant):
    from calamari_spark.operators.augment import augment_line

    img = np.random.RandomState(seed).randint(0, 256, (20, 40), dtype=np.uint8)
    a = augment_line(img, f"k{seed}", variant)
    b = augment_line(img, f"k{seed}", variant)
    assert np.array_equal(a, b)
    assert a.shape == img.shape and a.dtype == np.uint8


_PDF_CHARS = st.text(
    alphabet=st.sampled_from(
        # Latin-1 literals AND beyond-Latin-1 (Greek, CJK, an astral
        # emoji) — the latter exercise the UTF-16BE hex-string path the
        # writer emits per ISO 32000-1 §7.9.2.2 (round-4 ADVICE: the old
        # latin-1/'replace' encode silently mangled these to '?')
        "abcdefghijklmnopqrstuvwxyz0123456789 ()\\.,:;!?-'\"éüßΩλ中文🙂"
    ),
    max_size=24,
)


@given(st.lists(_PDF_CHARS, max_size=10))
@settings(max_examples=50, deadline=None)
def test_pdf_roundtrip_any_printable_lines(lines):
    """make_pdf -> extract_text is the identity on arbitrary printable
    lines (escaping of parens/backslashes included), despite the writer's
    scrambled stream order."""
    from calamari_spark.sources.pdf import extract_text, make_pdf

    assert extract_text(make_pdf(lines)) == lines


@given(
    st.text(
        alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz .,!?-"),
        max_size=80,
    )
)
@settings(max_examples=50, deadline=None)
def test_html_strip_is_whitespace_collapse_on_markup_free_text(text):
    """Tag- and entity-free text passes through the boilerplate strip
    unchanged modulo whitespace collapsing — the strip never eats
    content."""
    import re as _re

    from calamari_spark.functions.text import html_strip_str

    expected = _re.sub(r"\s+", " ", text).strip()
    assert html_strip_str(text) == expected
    assert html_strip_str(f"<div><p>{text}</p></div>") == expected
