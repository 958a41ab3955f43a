"""Deterministic procedural glyph font for the synthetic line corpus.

The reference blesses synthetic rendered line images as training/test data
(reference: calamari_ocr/ocr/dataset/datareader/generated_line_dataset/
line_generator.py:1-258 renders random text with PIL). No imaging libs are
available in this container, so glyphs are generated procedurally: each
character in the codec gets a fixed GLYPH_H x GLYPH_W binary template whose
pixel pattern derives from sha256(char) — distinct, seed-free, and identical
on every machine. Rendering places templates left-to-right on a baseline
with optional deterministic sine warp (so the center-normalizer has work to
do, mirroring the reference's line-generator distortions).
"""

from __future__ import annotations

import hashlib

import numpy as np

GLYPH_H = 16
GLYPH_W = 10
SPACE_W = 6


def glyph(ch: str) -> np.ndarray:
    """Deterministic GLYPH_H x GLYPH_W uint8 template (0 background /
    255 ink) for one character. Guaranteed >= 20 ink pixels, clustered
    around the vertical center band so lines have a text core."""
    if ch == " ":
        return np.zeros((GLYPH_H, SPACE_W), dtype=np.uint8)
    digest = hashlib.sha256(ch.encode("utf-8")).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))
    # core band: rows 3..13 get hash bits; margins stay empty (ascender gap)
    g = np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
    core = bits[: 10 * (GLYPH_W - 2)].reshape(10, GLYPH_W - 2)
    g[3:13, 1:-1] = core * 255
    # guarantee a connected stem so every glyph has ink in every column
    stem_col = 1 + digest[0] % (GLYPH_W - 2)
    g[3:13, stem_col] = 255
    g[8, 1:-1] = 255  # midline bar keeps the center-of-line well defined
    return g


def render_line(text: str, warp_amp: float = 0.0, warp_freq: float = 0.02,
                pad: int = 4, height: int = GLYPH_H + 8) -> np.ndarray:
    """Render text -> uint8 HxW line image, black ink (0) on white (255),
    with a deterministic sine baseline warp of amplitude ``warp_amp`` px.
    Matches the reference convention of dark-text-on-light-paper so the
    preprocessing inversion logic is exercised."""
    glyphs = [glyph(c) for c in text]
    total_w = sum(g.shape[1] for g in glyphs) + 2 * pad
    total_w = max(total_w, 2 * pad + 1)
    extra = int(np.ceil(abs(warp_amp)))
    h = height + 2 * extra
    canvas = np.zeros((h, total_w), dtype=np.uint8)  # ink mask first
    x = pad
    top0 = (h - GLYPH_H) // 2
    for g in glyphs:
        gw = g.shape[1]
        dy = int(round(warp_amp * np.sin(warp_freq * x))) if warp_amp else 0
        top = top0 + dy
        canvas[top : top + GLYPH_H, x : x + gw] = np.maximum(
            canvas[top : top + GLYPH_H, x : x + gw], g
        )
        x += gw
    return (255 - canvas).astype(np.uint8)  # invert: ink=0, paper=255
