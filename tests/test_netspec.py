"""Network-spec parser + generalized layer forward passes (SURVEY.md §2.D)."""

import numpy as np
import pytest

from calamari_spark.model.netspec import (
    DEFAULT_SPEC,
    SpecNet,
    downscale_factor,
    out_len_fn,
    parse_network_spec,
)


def test_parse_default_spec():
    layers = parse_network_spec(DEFAULT_SPEC)
    assert [l["type"] for l in layers] == ["cnn", "pool", "cnn", "pool", "lstm", "dropout"]
    assert layers[0] == {"type": "cnn", "filters": 40, "kernel": (3, 3)}
    assert layers[1] == {"type": "pool", "size": (2, 2)}
    assert layers[4] == {"type": "lstm", "units": 200}
    assert downscale_factor(layers) == 4


def test_parse_errors():
    for bad in ("cnn", "pool=2", "wat=1", "cnn=a:3x3"):
        with pytest.raises(ValueError):
            parse_network_spec(bad)


def test_out_len_matches_reference_rule():
    layers = parse_network_spec(DEFAULT_SPEC)
    assert out_len_fn(layers, 100) == 25
    assert out_len_fn(layers, 101) == 26
    up = parse_network_spec("cnn=8:3x3,pool=2x2,tcnn=8:2x2,lstm=8")
    assert out_len_fn(up, 100) == 100  # pool/2 then tconv*2


def test_specnet_forward_shapes_and_determinism():
    net = SpecNet("cnn=8:3x3,pool=2x2,cnn=12:3x3,pool=2x2,lstm=16,dropout=0.5",
                  classes=20, line_height=48)
    batch = np.random.RandomState(0).randint(0, 255, (3, 64, 48), dtype=np.uint8)
    sm = net.forward(batch)
    assert sm.shape == (3, 16, 20)
    assert np.allclose(sm.sum(axis=-1), 1.0, atol=1e-5)
    net2 = SpecNet("cnn=8:3x3,pool=2x2,cnn=12:3x3,pool=2x2,lstm=16,dropout=0.5",
                   classes=20, line_height=48)
    assert np.array_equal(sm, net2.forward(batch))


def test_dilated_block_and_tcnn():
    net = SpecNet("cnn=6:3x3,pool=2x2,dilated_block=8:3x3,tcnn=6:2x2,lstm=8",
                  classes=12, line_height=16)
    batch = np.zeros((2, 20, 16), dtype=np.uint8)
    sm = net.forward(batch)
    assert sm.shape == (2, 20, 12)  # /2 then x2 on the time axis
    assert np.allclose(sm.sum(axis=-1), 1.0, atol=1e-5)


def test_concat_skip_connection():
    # layer indices: 0 cnn(4) -> 1 cnn(6) -> 2 concat(0,1) -> 3 lstm
    net = SpecNet("cnn=4:3x3,cnn=6:3x3,concat=0:1,lstm=8", classes=10, line_height=8)
    batch = np.zeros((1, 12, 8), dtype=np.uint8)
    sm = net.forward(batch)
    assert sm.shape == (1, 12, 10)
