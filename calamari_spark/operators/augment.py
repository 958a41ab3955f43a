"""Deterministic line-image augmentation (the AugmentationProcessor analog).

The reference augments training lines with ocrodeg degradations
(reference: calamari_ocr/ocr/dataset/imageprocessors/augmentation.py +
thirdparty/ocrodeg — random blobs, multiscale noise, geometric jitter),
with ``n_augmentations`` variants generated per line. This re-derivation
keeps the operator DATA-PARALLEL and RETRY-SAFE: every variant's randomness
is seeded by (key, variant index), so a re-executed Spark task produces
bit-identical output — the property the reference's global RNG lacks and
the one that matters at 10^6-task scale.

Degradations (pure numpy, composable):
* translation jitter with background padding,
* salt/pepper speckle at a given density,
* 3x3 box blur,
* contrast squeeze toward the mean.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _rng_for(key: str, variant: int) -> np.random.RandomState:
    h = hashlib.sha256(f"aug|{key}|{variant}".encode()).digest()
    return np.random.RandomState(np.frombuffer(h[:4], dtype=np.uint32)[0])


def jitter(img: np.ndarray, rng: np.random.RandomState, max_shift: int = 2) -> np.ndarray:
    dy, dx = rng.randint(-max_shift, max_shift + 1, size=2)
    bg = int(img.max()) if img.size else 255
    out = np.full_like(img, bg)
    h, w = img.shape[:2]
    ys = slice(max(0, dy), min(h, h + dy))
    xs = slice(max(0, dx), min(w, w + dx))
    src_ys = slice(max(0, -dy), min(h, h - dy))
    src_xs = slice(max(0, -dx), min(w, w - dx))
    out[ys, xs] = img[src_ys, src_xs]
    return out


def speckle(img: np.ndarray, rng: np.random.RandomState, density: float = 0.01) -> np.ndarray:
    out = img.copy()
    mask = rng.rand(*img.shape) < density
    vals = rng.randint(0, 256, size=img.shape).astype(img.dtype)
    out[mask] = vals[mask]
    return out


def box_blur(img: np.ndarray) -> np.ndarray:
    p = np.pad(img.astype(np.float64), 1, mode="edge")
    out = sum(
        p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ) / 9.0
    return np.clip(np.rint(out), 0, 255).astype(img.dtype)


def contrast_squeeze(img: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    f = 0.6 + 0.4 * rng.rand()  # factor in [0.6, 1.0)
    mean = float(img.mean()) if img.size else 0.0
    out = mean + (img.astype(np.float64) - mean) * f
    return np.clip(np.rint(out), 0, 255).astype(img.dtype)


def augment_line(img: np.ndarray, key: str, variant: int) -> np.ndarray:
    """One deterministic augmented variant of a line image."""
    rng = _rng_for(key, variant)
    out = jitter(img, rng)
    out = speckle(out, rng)
    if rng.rand() < 0.5:
        out = box_blur(out)
    return contrast_squeeze(out, rng)


def augment_media(media: DataFrame, n_augmentations: int = 2) -> DataFrame:
    """(media_ref, png) -> n variants per line: (media_ref, aug_id, png,
    width, height). One mapInPandas pass; rows fan out 1->n inside the
    batch (the reference's n_augmentations), keyed deterministically."""
    from calamari_spark.sources.pngio import decode_png, encode_png

    schema = "media_ref string, aug_id int, png binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for ref, png in zip(b["media_ref"], b["png"]):
                img = decode_png(bytes(png))
                for k in range(n_augmentations):
                    aug = augment_line(img, ref, k)
                    rows.append(
                        {
                            "media_ref": ref,
                            "aug_id": k,
                            "png": encode_png(aug),
                            "width": int(aug.shape[1]),
                            "height": int(aug.shape[0]),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_ref", "aug_id", "png", "width", "height"])

    return media.select("media_ref", "png").mapInPandas(run, schema=schema)
