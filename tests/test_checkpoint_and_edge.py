"""Checkpoint save/load/migrate; degenerate media through the Spark path;
voter properties."""

import numpy as np
import pytest

from calamari_spark.codec import default_codec
from calamari_spark.model.checkpoint import VERSION, Checkpoint, load_checkpoint
from calamari_spark.model.netspec import DEFAULT_SPEC


def test_checkpoint_roundtrip(tmp_path):
    codec = default_codec()
    w = {"conv1_k": np.ones((3, 3, 1, 4), dtype=np.float32)}
    ck = Checkpoint(codec.charset, DEFAULT_SPEC, weights=w)
    d = str(tmp_path / "model.ckpt")
    ck.save(d)
    back = load_checkpoint(d)
    assert back.codec_charset == codec.charset
    assert back.network_spec == DEFAULT_SPEC
    assert back.version == VERSION
    assert np.array_equal(back.weights["conv1_k"], w["conv1_k"])


def test_checkpoint_migration_v0(tmp_path):
    import json, os
    d = tmp_path / "old.ckpt"
    d.mkdir()
    (d / "ckpt.json").write_text(json.dumps({
        "version": 0, "codec": {"charset": ["", "a"]},
        "network": "cnn=4:3x3,lstm=4", "line_height": 48, "pad": 16,
    }))
    ck = load_checkpoint(str(d))
    assert ck.version == VERSION
    assert ck.text_postproc == ["quotes", "spaces"]


def test_degenerate_media_through_spark_path(spark):
    """Empty/tiny/all-white images must not crash the recognize stage
    (reference: test_prediction.py:157-171)."""
    from calamari_spark.plans.extraction import recognize_media
    from calamari_spark.sources.pngio import encode_png

    imgs = [
        ("deg_1x1", encode_png(np.zeros((1, 1), dtype=np.uint8))),
        ("deg_white", encode_png(np.full((30, 50), 255, dtype=np.uint8))),
        ("deg_black", encode_png(np.zeros((20, 40), dtype=np.uint8))),
        ("deg_thin", encode_png(np.full((2, 300), 255, dtype=np.uint8))),
    ]
    df = spark.createDataFrame(
        [("d0", i, ref, png) for i, (ref, png) in enumerate(imgs)],
        "doc_id string, offset int, media_ref string, png binary",
    )
    rows = {r["media_ref"]: r for r in recognize_media(df).collect()}
    assert set(rows) == {r for r, _ in imgs}
    for r in rows.values():
        assert r["sentence"] is not None  # empty is fine, crash is not


def test_voter_properties():
    from calamari_spark.operators.ctc import greedy_decode
    from calamari_spark.operators.vote import vote_prediction

    rng = np.random.RandomState(3)
    p = rng.rand(30, 8).astype(np.float32)
    p /= p.sum(axis=1, keepdims=True)
    pred = greedy_decode(p)
    chars = [str(l) for l in pred.labels]
    for c, pos in zip(chars, pred.positions):
        for pc in pos.chars:
            pc.char = str(pc.label)
    # single voter -> deep copy passthrough (reference: voter.py:19-22)
    solo = vote_prediction([pred], [chars])
    assert solo.labels == pred.labels and solo is not pred
    # unanimous voters -> voted sentence equals the common sentence
    votes = vote_prediction([pred, pred, pred], [chars, chars, chars])
    assert votes.sentence == "".join(chars)
    assert votes.is_voted_result
