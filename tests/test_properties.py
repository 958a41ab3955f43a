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
