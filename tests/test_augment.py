"""Deterministic augmentation (AugmentationProcessor analog)."""

import numpy as np

from calamari_spark.operators.augment import (
    augment_line,
    augment_media,
    box_blur,
    jitter,
    speckle,
)
from calamari_spark.operators.ctc_loss import ctc_loss


def _line_img():
    rng = np.random.RandomState(7)
    img = np.full((32, 120), 255, dtype=np.uint8)
    img[10:22, 10:110] = (rng.rand(12, 100) * 80).astype(np.uint8)
    return img


def test_augment_is_deterministic_and_changes_pixels():
    img = _line_img()
    a = augment_line(img, "m0", 0)
    b = augment_line(img, "m0", 0)
    c = augment_line(img, "m0", 1)
    assert np.array_equal(a, b)  # retry-safe
    assert not np.array_equal(a, c)  # variants differ
    assert a.shape == img.shape and a.dtype == img.dtype


def test_primitives_preserve_shape_and_dtype():
    img = _line_img()
    rng = np.random.RandomState(0)
    for out in (jitter(img, rng), speckle(img, rng), box_blur(img)):
        assert out.shape == img.shape and out.dtype == np.uint8


def test_augment_media_spark_fanout(spark):
    from calamari_spark.sources.pngio import decode_png, encode_png

    img = _line_img()
    media = spark.createDataFrame(
        [("m0", bytearray(encode_png(img))), ("m1", bytearray(encode_png(img)))],
        "media_ref string, png binary",
    )
    out = augment_media(media, n_augmentations=3).collect()
    assert len(out) == 6
    assert {(r["media_ref"], r["aug_id"]) for r in out} == {
        (m, k) for m in ("m0", "m1") for k in range(3)
    }
    # decodes back, same dims
    r0 = next(r for r in out if r["media_ref"] == "m0" and r["aug_id"] == 0)
    dec = decode_png(bytes(r0["png"]))
    assert dec.shape == img.shape
    # rerun produces identical bytes (Spark-retry determinism)
    out2 = {(r["media_ref"], r["aug_id"]): bytes(r["png"])
            for r in augment_media(media, n_augmentations=3).collect()}
    assert all(out2[(r["media_ref"], r["aug_id"])] == bytes(r["png"]) for r in out)


def test_ctc_loss_metric_on_template_softmax(spark):
    """Train-metric integration: CTC loss of the template ensemble's own
    softmax against the GT labels is finite and small (the model is
    near-exact on the synthetic font)."""
    from calamari_spark.codec import default_codec
    from calamari_spark.model.template import TemplateRecognizer
    from calamari_spark.plans.extraction import load_interleaved
    from calamari_spark.sources.pngio import decode_png

    _, media = load_interleaved(spark, "/root/testdata/sf0.001")
    rows = media.select("media_ref", "png", "gt").limit(5).collect()
    codec = default_codec()
    rec = TemplateRecognizer(codec.charset, fold=0)
    for r in rows:
        img = decode_png(bytes(r["png"]))
        pooled = rec.pooled_scores(img)
        sm = rec.softmax_from_scores(pooled)
        labels = [codec.char2code[c] for c in r["gt"].replace(" ", "")]
        loss = ctc_loss(sm, labels)
        # near-exact model: small per-char NLL (~0.2 measured)
        assert 0 <= loss / len(labels) < 0.5
