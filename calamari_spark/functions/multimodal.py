"""Multimodal columns: opaque binary payloads + typed metadata.

Images are first-class (the pure-numpy PNG codec in sources/pngio.py makes
decode real in this container). Audio and video decode REQUIRE codec
libraries that are not installed here, so — as the build brief directs —
the decode step is stubbed with a clearly-marked deterministic fake while
the Spark-side plumbing (schema, Arrow batching, mapInPandas signatures,
partitioning) is real and tested. Swap ``_STUB_DECODERS`` for the real
libraries (soundfile / PyAV) on a production cluster; nothing else changes.

All operators are ``mapInPandas`` stages over binary columns — the same
executor-side batch shape as the OCR stage (reference analog: the
ImageLoader decode step, calamari_ocr/utils/image.py:28-97).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_STATS_SCHEMA = (
    "media_ref string, width int, height int, ink_ratio double"
)


def image_stats(media: DataFrame) -> DataFrame:
    """Batch-decode PNGs and emit per-image stats (real decode)."""
    from calamari_spark.sources.pngio import decode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for ref, png in zip(b["media_ref"], b["png"]):
                img = decode_png(bytes(png))
                rows.append(
                    {
                        "media_ref": ref,
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "ink_ratio": round(float((img < 128).mean()), 6),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_ref", "width", "height", "ink_ratio"])

    return media.select("media_ref", "png").mapInPandas(run, schema=IMAGE_STATS_SCHEMA)


RESIZED_SCHEMA = "media_ref string, png binary, width int, height int"


def resize_images(media: DataFrame, target_height: int) -> DataFrame:
    """Decode -> scale_to_h -> re-encode (real; aspect-preserving)."""
    from calamari_spark.operators.imaging import scale_to_h
    from calamari_spark.sources.pngio import decode_png, encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for ref, png in zip(b["media_ref"], b["png"]):
                img = scale_to_h(decode_png(bytes(png)), target_height)
                rows.append(
                    {
                        "media_ref": ref,
                        "png": encode_png(img),
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_ref", "png", "width", "height"])

    return media.select("media_ref", "png").mapInPandas(run, schema=RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# audio / video: STUBBED decode, real plumbing
# ---------------------------------------------------------------------------

def _stub_pcm_decode(payload: bytes, n: int = 256) -> np.ndarray:
    """STUB audio decode — deterministic fake PCM derived from the payload
    hash. A real deployment replaces this with e.g. soundfile.read()."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.RandomState(np.frombuffer(h[:4], dtype=np.uint32)[0])
    return (rng.rand(n).astype(np.float32) * 2 - 1)


def _stub_frame_sample(payload: bytes, n_frames: int) -> list[bytes]:
    """STUB video frame sampler — deterministic fake 8x8 gray frames.
    A real deployment replaces this with PyAV keyframe extraction."""
    out = []
    for i in range(n_frames):
        h = hashlib.sha256(payload + i.to_bytes(4, "big")).digest()
        frame = np.frombuffer((h * 2)[:64], dtype=np.uint8).reshape(8, 8)
        out.append(frame.tobytes())
    return out


AUDIO_FEATURES_SCHEMA = (
    "media_ref string, n_samples int, rms double, zero_crossings int,"
    " peak double"
)


def audio_features(audio: DataFrame) -> DataFrame:
    """Per-clip features over (media_ref, payload:binary). The feature math
    is real; only the decode is the documented stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for ref, payload in zip(b["media_ref"], b["payload"]):
                pcm = _stub_pcm_decode(bytes(payload))
                rows.append(
                    {
                        "media_ref": ref,
                        "n_samples": int(pcm.size),
                        "rms": round(float(np.sqrt(np.mean(pcm**2))), 6),
                        "zero_crossings": int(np.sum(np.diff(np.signbit(pcm)) != 0)),
                        "peak": round(float(np.abs(pcm).max()), 6),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_ref", "n_samples", "rms", "zero_crossings", "peak"]
            )

    return audio.select("media_ref", "payload").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


VIDEO_FRAMES_SCHEMA = (
    "media_ref string, frame_idx int, frame binary, frame_mean double"
)


def sample_video_frames(video: DataFrame, n_frames: int = 4) -> DataFrame:
    """Explode each clip into ``n_frames`` sampled frames (one row per
    frame — a mapInPandas UDTF shape). Decode is the documented stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for ref, payload in zip(b["media_ref"], b["payload"]):
                for i, frame in enumerate(_stub_frame_sample(bytes(payload), n_frames)):
                    arr = np.frombuffer(frame, dtype=np.uint8)
                    rows.append(
                        {
                            "media_ref": ref,
                            "frame_idx": i,
                            "frame": frame,
                            "frame_mean": round(float(arr.mean()), 6),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_ref", "frame_idx", "frame", "frame_mean"]
            )

    return video.select("media_ref", "payload").mapInPandas(
        run, schema=VIDEO_FRAMES_SCHEMA
    )
