"""Image preprocessing + numpy model unit tests."""

import numpy as np
import pytest

from calamari_spark.codec import default_codec
from calamari_spark.model.numpy_net import RecognitionNet, pad_batch, ensemble_softmax
from calamari_spark.model.template import TemplateRecognizer
from calamari_spark.operators.ctc import greedy_decode, greedy_labels
from calamari_spark.operators.imaging import (
    CenterNormalizer,
    data_range,
    final_preparation,
    is_valid_line,
    preprocess_line,
    scale_to_h,
    to_uint8,
)
from calamari_spark.sources.font import render_line
from calamari_spark.sources.pngio import decode_png, encode_png


def test_to_uint8_variants():
    assert to_uint8(np.array([0.0, 1.0])).tolist() == [0, 255]
    assert to_uint8(np.array([True, False])).tolist() == [255, 0]
    assert to_uint8(np.array([-128, 127], dtype=np.int8)).tolist() == [0, 255]


def test_scale_to_h_aspect():
    img = np.full((30, 90), 128, dtype=np.uint8)
    out = scale_to_h(img, 48)
    assert out.shape == (48, 144)
    down = scale_to_h(img, 15)
    assert down.shape == (15, 45)
    # constant image stays constant under both resamplers
    assert int(out.min()) == int(out.max()) == 128
    assert int(down.min()) == int(down.max()) == 128


def test_center_normalizer_straightens_warped_line():
    img = render_line("hello world test line", warp_amp=4.0, height=44)
    meta = {}
    gray = data_range(img, meta)
    norm = CenterNormalizer(48).normalize(gray, meta)
    assert norm.shape[0] == 48
    assert 0 < meta["m2"] <= 4
    # ink must survive the dewarp
    assert (norm < 100).sum() > 50


def test_final_preparation_shape_and_inversion():
    img = np.full((48, 100), 255, dtype=np.uint8)  # white paper
    img[20:30, 40:60] = 0  # black ink
    meta = {}
    out = final_preparation(img, meta)
    # transposed to time-major + 16 px pad both sides
    assert out.shape == (132, 48)
    assert meta["padded_width"] == 132
    # inversion: paper -> 0, ink -> 255
    assert out[0, 0] == 0 and out[56, 25] == 255


def test_preprocess_line_full_chain_and_degenerate():
    img = render_line("spark line", warp_amp=2.0)
    out, meta = preprocess_line(img)
    assert out.shape[1] == 48 and out.shape[0] > 32
    assert {"m1", "m2", "t", "pad", "padded_width", "line_width"} <= set(meta)
    # degenerate inputs must not crash (reference: test_prediction.py:157-171)
    for shape in [(0, 0), (1, 0), (0, 1)]:
        out, meta = preprocess_line(np.zeros(shape, dtype=np.uint8))
        assert out.shape == (32, 48)
    out, _ = preprocess_line(np.full((30, 50), 255, dtype=np.uint8))  # all white
    assert out.shape[1] == 48


def test_is_valid_line():
    # reference: preparesample.py:32-67
    assert is_valid_line([1, 2, 3], downscaled_len=10, full_len=40)
    assert not is_valid_line([], 10, 40)  # empty GT
    assert not is_valid_line([1] * 20, 10, 40)  # CTC-infeasible
    assert not is_valid_line([1, 1], 3, 5000)  # too wide
    # repeated chars need blanks: "aa" -> needs 3 frames
    assert is_valid_line([1, 1], 3, 40)
    assert not is_valid_line([1, 1], 2, 40)


def test_recognition_net_shapes_and_determinism():
    codec = default_codec()
    net = RecognitionNet.pinned(len(codec), fold=0, conv1=8, conv2=12, lstm=16)
    lines = [np.random.RandomState(i).randint(0, 255, (60 + 7 * i, 48), dtype=np.uint8) for i in range(3)]
    batch, lengths = pad_batch(lines)
    assert batch.shape[1] % 4 == 0
    sm = net.forward(batch)
    assert sm.shape == (3, batch.shape[1] // 4, len(codec))
    assert np.allclose(sm.sum(axis=-1), 1.0, atol=1e-5)
    sm2 = net.forward(batch)
    assert np.array_equal(sm, sm2)
    # pinned weights identical across constructions
    net2 = RecognitionNet.pinned(len(codec), fold=0, conv1=8, conv2=12, lstm=16)
    assert np.array_equal(net2.forward(batch), sm)
    # different folds differ
    net3 = RecognitionNet.pinned(len(codec), fold=1, conv1=8, conv2=12, lstm=16)
    assert not np.array_equal(net3.forward(batch), sm)


def test_recognition_net_save_load_roundtrip(tmp_path):
    codec = default_codec()
    net = RecognitionNet.pinned(len(codec), fold=2, conv1=4, conv2=6, lstm=8)
    p = tmp_path / "w.npz"
    net.save(p)
    loaded = RecognitionNet.load(p)
    batch, _ = pad_batch([np.zeros((40, 48), dtype=np.uint8)])
    assert np.array_equal(net.forward(batch), loaded.forward(batch))


def test_out_len():
    assert RecognitionNet.out_len(100) == 25
    assert RecognitionNet.out_len(101) == 26
    assert RecognitionNet.out_len(1) == 1


def test_ensemble_softmax_mean():
    codec = default_codec()
    nets = [RecognitionNet.pinned(len(codec), fold=k, conv1=4, conv2=6, lstm=8) for k in range(2)]
    batch, _ = pad_batch([np.zeros((20, 48), dtype=np.uint8)])
    stack = ensemble_softmax(nets, batch)
    assert stack.shape[0] == 2
    mean = stack.mean(axis=0)
    assert np.allclose(mean.sum(axis=-1), 1.0, atol=1e-5)


def test_template_recognizer_reads_clean_line():
    codec = default_codec()
    rec = TemplateRecognizer(codec.charset)
    text = "the fast table scan"
    img = render_line(text, warp_amp=0.0)
    sm = rec.forward_single(img)
    labels = greedy_labels(sm, blank=0)
    decoded = "".join(codec.code2char[l] for l, _, _ in labels)
    # spaces are not emitted by the template model (no space glyph);
    # compare letters only
    assert decoded == text.replace(" ", "")


def test_template_recognizer_png_roundtrip_decode():
    codec = default_codec()
    rec = TemplateRecognizer(codec.charset)
    text = "problem set up as"
    png = encode_png(render_line(text))
    sm = rec.forward_single(decode_png(png))
    pred = greedy_decode(sm)
    decoded = "".join(codec.code2char[l] for l in pred.labels)
    assert decoded == text.replace(" ", "")
    assert pred.avg_char_probability > 0.5
