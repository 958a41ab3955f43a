"""Batched numpy forward pass of the default recognition network.

Architecture parity with the reference's default graph
(reference: calamari_ocr/ocr/model/params.py:10-23 — conv 40@3x3, pool 2x2,
conv 60@3x3, pool 2x2, BiLSTM 200, dropout (inference no-op), dense softmax;
graph assembly model/graph.py:49-113; blank is label 0 after the softmax
roll, graph.py:92-99; downscale factor 4, ceil per pool).

The reference's shipped TF weights are absent from the snapshot
(.MISSING_LARGE_BLOBS), so weights here are pinned seeded tensors
(sha256-derived RandomState, glorot-uniform) — goldens are self-derived.

Everything is *batched*: one forward call processes a whole Arrow batch of
padded lines as [B, T, H, C] ndarrays; per-timestep work is a single
[B, in] @ [in, out] GEMM, never a per-line Python loop. This is the
inference pandas-UDF kernel, loaded once per executor.
"""

from __future__ import annotations

import hashlib
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

DEFAULT_LINE_HEIGHT = 48
DOWNSCALE_FACTOR = 4  # two 2x2 pools


def _rng(*keys) -> np.random.RandomState:
    h = hashlib.sha256("|".join(str(k) for k in keys).encode()).digest()
    return np.random.RandomState(np.frombuffer(h[:4], dtype=np.uint32)[0])


def _glorot(rng, shape) -> np.ndarray:
    fan_in = int(np.prod(shape[:-1]))
    fan_out = int(shape[-1])
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return rng.uniform(-limit, limit, size=shape).astype(np.float32)


class RecognitionNet:
    """conv40-pool-conv60-pool-bilstm200-dense(classes), blank-first."""

    def __init__(self, weights: Dict[str, np.ndarray], classes: int,
                 line_height: int = DEFAULT_LINE_HEIGHT):
        self.w = weights
        self.classes = classes
        self.line_height = line_height

    # -- weights ----------------------------------------------------------
    @classmethod
    def pinned(cls, classes: int, fold: int = 0,
               line_height: int = DEFAULT_LINE_HEIGHT,
               conv1: int = 40, conv2: int = 60, lstm: int = 200
               ) -> "RecognitionNet":
        rng = _rng("calamari_spark_weights", fold, classes, conv1, conv2, lstm)
        feat = (line_height // 4) * conv2
        w = {
            "conv1_k": _glorot(rng, (3, 3, 1, conv1)),
            "conv1_b": np.zeros(conv1, dtype=np.float32),
            "conv2_k": _glorot(rng, (3, 3, conv1, conv2)),
            "conv2_b": np.zeros(conv2, dtype=np.float32),
            # forward + backward LSTM: kernel [feat, 4u], recurrent [u, 4u]
            "lstm_fw_k": _glorot(rng, (feat, 4 * lstm)),
            "lstm_fw_r": _glorot(rng, (lstm, 4 * lstm)),
            "lstm_fw_b": _lstm_bias(lstm),
            "lstm_bw_k": _glorot(rng, (feat, 4 * lstm)),
            "lstm_bw_r": _glorot(rng, (lstm, 4 * lstm)),
            "lstm_bw_b": _lstm_bias(lstm),
            "dense_k": _glorot(rng, (2 * lstm, classes)),
            "dense_b": np.zeros(classes, dtype=np.float32),
        }
        return cls(w, classes, line_height)

    def save(self, path: str | Path) -> None:
        np.savez_compressed(path, classes=self.classes,
                            line_height=self.line_height, **self.w)

    @classmethod
    def load(cls, path: str | Path) -> "RecognitionNet":
        z = np.load(path)
        classes = int(z["classes"])
        lh = int(z["line_height"])
        w = {k: z[k] for k in z.files if k not in ("classes", "line_height")}
        return cls(w, classes, lh)

    # -- layers (batched) ---------------------------------------------------
    @staticmethod
    def _conv3x3_relu(x: np.ndarray, k: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Same-padding 3x3 conv as 9 shifted GEMMs
        (reference layer: model/layers/conv2d.py:39-55)."""
        B, T, H, Cin = x.shape
        Cout = k.shape[-1]
        xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = np.zeros((B, T, H, Cout), dtype=np.float32)
        flat = out.reshape(-1, Cout)
        for dy in range(3):
            for dx in range(3):
                patch = xp[:, dy : dy + T, dx : dx + H, :].reshape(-1, Cin)
                flat += patch @ k[dy, dx]
        out += b
        np.maximum(out, 0, out=out)
        return out

    @staticmethod
    def _maxpool2(x: np.ndarray) -> np.ndarray:
        """2x2 max pool, ceil semantics via edge padding
        (reference: model/layers/pool2d.py:43-58)."""
        B, T, H, C = x.shape
        if T % 2 or H % 2:
            x = np.pad(x, ((0, 0), (0, T % 2), (0, H % 2), (0, 0)),
                       mode="constant", constant_values=-np.inf)
            B, T, H, C = x.shape[0], x.shape[1], x.shape[2], x.shape[3]
        x = x.reshape(B, T // 2, 2, H // 2, 2, C)
        return x.max(axis=(2, 4))

    @staticmethod
    def _lstm_dir(x: np.ndarray, k: np.ndarray, r: np.ndarray, b: np.ndarray,
                  reverse: bool = False) -> np.ndarray:
        """One LSTM direction over [B, T, F]; Keras gate order i,f,c,o
        (reference layer: model/layers/bilstm.py:25-49)."""
        B, T, F = x.shape
        units = r.shape[0]
        h = np.zeros((B, units), dtype=np.float32)
        c = np.zeros((B, units), dtype=np.float32)
        out = np.empty((B, T, units), dtype=np.float32)
        xs = x[:, ::-1, :] if reverse else x
        pre = xs.reshape(-1, F) @ k  # all timesteps at once
        pre = pre.reshape(B, T, 4 * units) + b
        for t in range(T):
            z = pre[:, t, :] + h @ r
            i = _sigmoid(z[:, :units])
            f = _sigmoid(z[:, units : 2 * units])
            g = np.tanh(z[:, 2 * units : 3 * units])
            o = _sigmoid(z[:, 3 * units :])
            c = f * c + i * g
            h = o * np.tanh(c)
            out[:, t, :] = h
        return out[:, ::-1, :] if reverse else out

    # -- forward ------------------------------------------------------------
    def forward(self, batch: np.ndarray, temperature: float = 0.0) -> np.ndarray:
        """[B, T, H] uint8 (time-major lines, already padded to a common T
        that is a multiple of 4) -> blank-first softmax [B, T/4, classes].

        temperature > 0 divides the logits before the softmax (reference:
        model/graph.py:92-99, the optional calibration knob): the argmax —
        and therefore the greedy decode — is unchanged, but alternative
        probabilities flatten (T > 1) or sharpen (T < 1). 0 = off (the
        reference's default, params.temperature <= 0)."""
        x = batch.astype(np.float32) / 255.0  # graph.py:65
        x = x[..., None]
        x = self._conv3x3_relu(x, self.w["conv1_k"], self.w["conv1_b"])
        x = self._maxpool2(x)
        x = self._conv3x3_relu(x, self.w["conv2_k"], self.w["conv2_b"])
        x = self._maxpool2(x)
        B, T, H, C = x.shape
        x = x.reshape(B, T, H * C)
        fw = self._lstm_dir(x, self.w["lstm_fw_k"], self.w["lstm_fw_r"], self.w["lstm_fw_b"])
        bw = self._lstm_dir(x, self.w["lstm_bw_k"], self.w["lstm_bw_r"], self.w["lstm_bw_b"], reverse=True)
        x = np.concatenate([fw, bw], axis=-1)
        logits = x.reshape(-1, x.shape[-1]) @ self.w["dense_k"] + self.w["dense_b"]
        logits = logits.reshape(B, T, self.classes)
        if temperature > 0:
            logits = logits / np.float32(temperature)  # graph.py:96-97
        # blank-last softmax rolled to blank-first (graph.py:57-61, 92-99)
        sm = _softmax(logits)
        return np.roll(sm, shift=1, axis=-1)

    @staticmethod
    def out_len(img_len: int) -> int:
        """Downscaled sequence length: ceil per pool
        (reference: model/params.py:77-105)."""
        return int(np.ceil(np.ceil(img_len / 2) / 2))


def _lstm_bias(units: int) -> np.ndarray:
    b = np.zeros(4 * units, dtype=np.float32)
    b[units : 2 * units] = 1.0  # unit forget bias (Keras default)
    return b


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# batching helpers
# ---------------------------------------------------------------------------

def pad_batch(lines: List[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Stack variable-width time-major lines [Ti, H] into [B, Tmax, H]
    (Tmax rounded up to a multiple of 4) + lengths; the in-batch analog of
    the reference's tf.data padded batching (data.py:72-92)."""
    lengths = np.array([l.shape[0] for l in lines], dtype=np.int32)
    tmax = int(max(1, -(-int(lengths.max()) // DOWNSCALE_FACTOR) * DOWNSCALE_FACTOR))
    h = lines[0].shape[1]
    out = np.zeros((len(lines), tmax, h), dtype=np.uint8)
    for i, l in enumerate(lines):
        out[i, : l.shape[0]] = l
    return out, lengths


def ensemble_softmax(nets: List["RecognitionNet"], batch: np.ndarray) -> np.ndarray:
    """Mean blank-first softmax over folds on one shared input batch
    (reference: model/ensemblegraph.py:47-55) -> [K, B, T/4, classes] stacked
    per-fold outputs; callers mean over axis 0 for the in-graph ensemble."""
    return np.stack([net.forward(batch) for net in nets])
