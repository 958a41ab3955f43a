"""CTC loss (negative log-likelihood) via the log-domain forward algorithm.

The reference computes this inside TensorFlow during training
(reference: calamari_ocr/ocr/model/model.py — tf.nn.ctc_loss on the
blank-first softmax); here it serves as an EVALUATION metric: how likely
the ground truth is under a model's per-frame distribution. Standard CTC
forward recursion (Graves et al. 2006) over the blank-interleaved label
sequence; log-sum-exp throughout, vectorized over the DP column.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

NEG_INF = -np.inf


def _logsumexp2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    m = np.maximum(a, b)
    finite = ~np.isneginf(m)
    diff = np.zeros_like(m)
    np.subtract(a, b, out=diff, where=finite)  # -inf - -inf would be nan
    out = np.full_like(m, NEG_INF)
    out[finite] = m[finite] + np.log1p(np.exp(-np.abs(diff[finite])))
    return out


def ctc_loss(softmax: np.ndarray, labels: Sequence[int], blank: int = 0) -> float:
    """-log P(labels | softmax). softmax is (T, C); labels exclude blanks.

    Returns +inf when the sequence is infeasible (T < required frames)."""
    T = softmax.shape[0]
    labels = list(labels)
    # blank-interleaved extended sequence: b l1 b l2 b ... ln b
    ext = [blank]
    for l in labels:
        ext.extend((l, blank))
    S = len(ext)
    if T == 0:
        return 0.0 if not labels else float("inf")
    # minimal frames: every label + a separating frame for adjacent repeats
    required = len(labels) + sum(
        1 for i in range(1, len(labels)) if labels[i] == labels[i - 1]
    )
    if T < required:
        return float("inf")

    with np.errstate(divide="ignore"):
        logp = np.log(softmax)
    ext_arr = np.array(ext)
    # can_skip[s]: alpha may jump from s-2 (ext[s] is a label differing from ext[s-2])
    can_skip = np.zeros(S, dtype=bool)
    if S > 2:
        can_skip[2:] = (ext_arr[2:] != blank) & (ext_arr[2:] != ext_arr[:-2])

    alpha = np.full(S, NEG_INF)
    alpha[0] = logp[0, blank]
    if S > 1:
        alpha[1] = logp[0, ext[1]]
    for t in range(1, T):
        stay = alpha
        step = np.full(S, NEG_INF)
        step[1:] = alpha[:-1]
        skip = np.full(S, NEG_INF)
        if S > 2:
            skip[2:] = alpha[:-2]
        skip = np.where(can_skip, skip, NEG_INF)
        alpha = _logsumexp2(_logsumexp2(stay, step), skip) + logp[t, ext_arr]
    total = _logsumexp2(alpha[-1:], alpha[-2:-1] if S > 1 else np.array([NEG_INF]))[0]
    return float(-total)
