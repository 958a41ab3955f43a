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


def test_checkpoint_migration_v1_committed_fixture():
    """The committed v1 checkpoint (fixtures/checkpoints/v1) must migrate
    through the chain: v1 -> v2 renames 'network' -> 'network_spec'
    (reference: saved_model.py:51-116 applies one hop per version)."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ck = load_checkpoint(os.path.join(root, "fixtures", "checkpoints", "v1"))
    assert ck.version == VERSION == 2
    assert ck.network_spec.startswith("cnn=40:3x3")
    assert ck.codec_charset[:2] == ["", " "]


def test_checkpoint_malformed_v1_missing_network_raises_valueerror(tmp_path):
    """A v1 config without the 'network' key must surface the chain's
    'cannot migrate' ValueError, not a bare KeyError."""
    import json

    d = tmp_path / "bad_v1.ckpt"
    d.mkdir()
    (d / "ckpt.json").write_text(json.dumps({
        "version": 1, "codec": {"charset": [""]},
        "line_height": 48, "pad": 16, "text_postproc": [],
    }))
    with pytest.raises(ValueError, match="missing the 'network' key"):
        load_checkpoint(str(d))


def test_checkpoint_future_version_refuses(tmp_path):
    import json

    d = tmp_path / "future.ckpt"
    d.mkdir()
    (d / "ckpt.json").write_text(json.dumps({
        "version": 99, "codec": {"charset": [""]},
        "network_spec": "lstm=4", "line_height": 48, "pad": 16,
        "text_postproc": [],
    }))
    with pytest.raises(ValueError):
        load_checkpoint(str(d))


def test_softmax_temperature_flattens_but_keeps_argmax():
    """graph.py:92-99 parity: temperature > 1 must flatten alternative
    probabilities without changing the argmax (so greedy text is stable
    while find_alternatives sees different confidence mass)."""
    from calamari_spark.model.numpy_net import RecognitionNet, pad_batch

    net = RecognitionNet.pinned(6, fold=0, conv1=4, conv2=6, lstm=8)
    rng = np.random.RandomState(7)
    line = (rng.rand(40, 48) * 255).astype(np.uint8)
    batch, _ = pad_batch([line])
    cold = net.forward(batch)
    hot = net.forward(batch, temperature=4.0)
    assert np.array_equal(cold.argmax(-1), hot.argmax(-1))
    # flatter: the max probability drops everywhere temperature is applied
    assert (hot.max(-1) <= cold.max(-1) + 1e-7).all()
    assert hot.max() < cold.max()
    # off switch (temperature <= 0) is bit-identical to the default
    assert np.array_equal(cold, net.forward(batch, temperature=0.0))
