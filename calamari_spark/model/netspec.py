"""Network-spec string parser + generalized numpy forward pass.

Re-derivation of the reference's network definition syntax and layer set
(reference: calamari_ocr/ocr/training/params.py:90-97 syntax, :120-246
parser; layer registry model/params.py:26-43; presets
resources/networks/{def,deep3,htr+}.json):

  "cnn=40:3x3,pool=2x2,cnn=60:3x3,pool=2x2,lstm=200,dropout=0.5"

Supported layer tokens:
  cnn=F[:KxK]          Conv2D same-pad relu      (conv2d.py:39-55)
  pool=PxP             MaxPool2D ceil semantics  (pool2d.py:43-58)
  lstm=U               BiLSTM concat merge       (bilstm.py:25-49)
  dropout=R            inference no-op           (dropout.py:24-33)
  dilated_block=F[:KxK] parallel dilated convs (rates 2,4) concat
                                                (dilatedblock.py:39-70)
  tcnn=F[:KxK]         TransposedConv2D stride 2 upsampling
                                                (transposedconv2d.py)
  concat=i:j           concat the outputs of layers i and j (concat.py)

``SpecNet`` builds pinned seeded weights for any spec and runs the batched
forward pass; ``out_len_fn`` folds the per-layer time-axis scaling
(model/params.py:77-105).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

from calamari_spark.model.numpy_net import (
    RecognitionNet,
    _glorot,
    _lstm_bias,
    _rng,
    _softmax,
)

DEFAULT_SPEC = "cnn=40:3x3,pool=2x2,cnn=60:3x3,pool=2x2,lstm=200,dropout=0.5"


def parse_network_spec(spec: str) -> List[Dict]:
    """Spec string -> ordered layer-param dicts (reference parser shape,
    training/params.py:120-246)."""
    layers: List[Dict] = []
    for token in spec.split(","):
        token = token.strip()
        if not token:
            continue
        if "=" not in token:
            raise ValueError(f"bad layer token {token!r}")
        kind, val = token.split("=", 1)
        kind = kind.strip().lower()
        if kind in ("cnn", "conv", "dilated_block", "tcnn", "transposed_cnn"):
            m = re.fullmatch(r"(\d+)(?::(\d+)x(\d+))?", val)
            if not m:
                raise ValueError(f"bad conv spec {token!r}")
            filters = int(m.group(1))
            kx = int(m.group(2) or 3)
            ky = int(m.group(3) or 3)
            name = {"conv": "cnn", "transposed_cnn": "tcnn"}.get(kind, kind)
            layers.append({"type": name, "filters": filters, "kernel": (kx, ky)})
        elif kind == "pool":
            m = re.fullmatch(r"(\d+)x(\d+)", val)
            if not m:
                raise ValueError(f"bad pool spec {token!r}")
            layers.append({"type": "pool", "size": (int(m.group(1)), int(m.group(2)))})
        elif kind == "lstm":
            layers.append({"type": "lstm", "units": int(val)})
        elif kind == "dropout":
            layers.append({"type": "dropout", "rate": float(val)})
        elif kind == "concat":
            i, j = val.split(":")
            layers.append({"type": "concat", "from": (int(i), int(j))})
        else:
            raise ValueError(f"unknown layer kind {kind!r}")
    return layers


def downscale_factor(layers: List[Dict]) -> int:
    f = 1
    for l in layers:
        if l["type"] == "pool":
            f *= l["size"][0]
        elif l["type"] == "tcnn":
            f = max(1, f // 2)
    return f


def out_len_fn(layers: List[Dict], img_len: int) -> int:
    """Downscaled sequence length (reference: model/params.py:77-105)."""
    n = img_len
    for l in layers:
        if l["type"] == "pool":
            n = int(np.ceil(n / l["size"][0]))
        elif l["type"] == "tcnn":
            n = n * 2
    return int(n)


class SpecNet:
    """Batched numpy forward pass for an arbitrary parsed spec; pinned
    seeded weights (the reference's trained weights are absent from the
    snapshot — .MISSING_LARGE_BLOBS). Blank-first softmax output."""

    def __init__(self, spec: str, classes: int, line_height: int = 48, fold: int = 0):
        self.layers = parse_network_spec(spec)
        self.classes = classes
        self.line_height = line_height
        rng = _rng("calamari_spark_specnet", spec, classes, line_height, fold)
        self.weights: List[Dict[str, np.ndarray]] = []
        # trace channel/height through the stack to size the kernels
        h, c = line_height, 1
        traces: List[Tuple[int, int]] = []
        for l in self.layers:
            w: Dict[str, np.ndarray] = {}
            if l["type"] == "cnn":
                kx, ky = l["kernel"]
                w["k"] = _glorot(rng, (kx, ky, c, l["filters"]))
                w["b"] = np.zeros(l["filters"], dtype=np.float32)
                c = l["filters"]
            elif l["type"] == "dilated_block":
                kx, ky = l["kernel"]
                half = l["filters"] // 2
                w["k1"] = _glorot(rng, (kx, ky, c, half))
                w["b1"] = np.zeros(half, dtype=np.float32)
                w["k2"] = _glorot(rng, (kx, ky, c, l["filters"] - half))
                w["b2"] = np.zeros(l["filters"] - half, dtype=np.float32)
                c = l["filters"]
            elif l["type"] == "tcnn":
                w["k"] = _glorot(rng, (2, 2, c, l["filters"]))
                w["b"] = np.zeros(l["filters"], dtype=np.float32)
                c = l["filters"]
                h = h * 2
            elif l["type"] == "pool":
                h = int(np.ceil(h / l["size"][1]))
            elif l["type"] == "lstm":
                feat = h * c
                u = l["units"]
                for d in ("fw", "bw"):
                    w[f"{d}_k"] = _glorot(rng, (feat, 4 * u))
                    w[f"{d}_r"] = _glorot(rng, (u, 4 * u))
                    w[f"{d}_b"] = _lstm_bias(u)
                c, h = 2 * u, 1  # collapsed to features
            elif l["type"] == "concat":
                i, j = l["from"]
                c = traces[i][1] + traces[j][1]
                h = traces[i][0]
            self.weights.append(w)
            traces.append((h, c))
        self.dense_k = _glorot(rng, (h * c, classes))
        self.dense_b = np.zeros(classes, dtype=np.float32)

    # -- layer kernels (batched; conv/pool/lstm shared with RecognitionNet)
    @staticmethod
    def _conv(x, k, b, dilation: int = 1):
        KX, KY, Cin, Cout = k.shape
        B, T, H, _ = x.shape
        rx, ry = (KX // 2) * dilation, (KY // 2) * dilation
        xp = np.pad(x, ((0, 0), (rx, rx), (ry, ry), (0, 0)))
        out = np.zeros((B, T, H, Cout), dtype=np.float32)
        flat = out.reshape(-1, Cout)
        for dx in range(KX):
            for dy in range(KY):
                ox, oy = dx * dilation, dy * dilation
                patch = xp[:, ox : ox + T, oy : oy + H, :].reshape(-1, Cin)
                flat += patch @ k[dx, dy]
        out += b
        np.maximum(out, 0, out=out)
        return out

    @staticmethod
    def _pool(x, px, py):
        B, T, H, C = x.shape
        pt, ph = (-T) % px, (-H) % py
        if pt or ph:
            x = np.pad(x, ((0, 0), (0, pt), (0, ph), (0, 0)),
                       mode="constant", constant_values=-np.inf)
        B, T, H, C = x.shape
        return x.reshape(B, T // px, px, H // py, py, C).max(axis=(2, 4))

    @staticmethod
    def _tconv(x, k, b):
        """Stride-2 transposed conv (learned 2x upsampling), relu
        (reference: model/layers/transposedconv2d.py)."""
        B, T, H, Cin = x.shape
        Cout = k.shape[-1]
        out = np.zeros((B, 2 * T, 2 * H, Cout), dtype=np.float32)
        flat = x.reshape(-1, Cin)
        for i in range(2):
            for j in range(2):
                contrib = (flat @ k[i, j]).reshape(B, T, H, Cout)
                out[:, i::2, j::2, :] += contrib
        out += b
        np.maximum(out, 0, out=out)
        return out

    def forward(self, batch: np.ndarray, temperature: float = 0.0) -> np.ndarray:
        """[B, T, H] uint8 -> blank-first softmax [B, out_len(T), classes].
        temperature > 0 divides the logits pre-softmax (graph.py:92-99)."""
        x = batch.astype(np.float32) / 255.0
        x = x[..., None]
        outputs: List[np.ndarray] = []
        for l, w in zip(self.layers, self.weights):
            t = l["type"]
            if t == "cnn":
                x = self._conv(x, w["k"], w["b"])
            elif t == "dilated_block":
                x = np.concatenate(
                    [self._conv(x, w["k1"], w["b1"], dilation=2),
                     self._conv(x, w["k2"], w["b2"], dilation=4)],
                    axis=-1,
                )
            elif t == "tcnn":
                x = self._tconv(x, w["k"], w["b"])
            elif t == "pool":
                x = self._pool(x, *l["size"])
            elif t == "dropout":
                pass  # inference no-op (dropout.py:24-33)
            elif t == "concat":
                i, j = l["from"]
                x = np.concatenate([outputs[i], outputs[j]], axis=-1)
            elif t == "lstm":
                B, T, H, C = x.shape
                flatx = x.reshape(B, T, H * C)
                fw = RecognitionNet._lstm_dir(flatx, w["fw_k"], w["fw_r"], w["fw_b"])
                bw = RecognitionNet._lstm_dir(flatx, w["bw_k"], w["bw_r"], w["bw_b"], reverse=True)
                x = np.concatenate([fw, bw], axis=-1)[:, :, None, :]
            outputs.append(x)
        B, T = x.shape[0], x.shape[1]
        logits = x.reshape(B, T, -1) @ self.dense_k + self.dense_b
        if temperature > 0:
            logits = logits / np.float32(temperature)  # graph.py:96-97
        return np.roll(_softmax(logits), shift=1, axis=-1)

    def out_len(self, img_len: int) -> int:
        return out_len_fn(self.layers, img_len)
