"""Driver-contract queries for the multimodal operators."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calamari_spark.functions.multimodal import (
    audio_features,
    image_stats,
    resize_images,
    sample_video_frames,
)

N_CLIPS = 16


def x_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG decode over the media store; width/height verified against
    the fixture's stored dimensions by the oracle."""
    from calamari_spark.plans.extraction import load_interleaved

    _, media = load_interleaved(spark, sf_dir)
    return image_stats(media).select("media_ref", "width", "height").orderBy("media_ref")


def x_image_stats_oracle(sf_dir: str) -> str:
    from calamari_spark.plans.extraction import _fixture_glob

    return (
        f"SELECT media_ref, width, height FROM"
        f" read_parquet('{_fixture_glob(sf_dir, 'line_images')}') ORDER BY media_ref"
    )


def x_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> aspect-preserving resize to 32 px -> re-encode. The oracle
    derives the output dims from the stored ones (w' = round(32*w/h),
    h' = 32) — the resampled BYTES have no SQL oracle, but the geometry
    contract does."""
    from calamari_spark.plans.extraction import load_interleaved

    _, media = load_interleaved(spark, sf_dir)
    return (
        resize_images(media, 32)
        .select("media_ref", "width", "height")
        .orderBy("media_ref")
    )


def x_image_resize_oracle(sf_dir: str) -> str:
    from calamari_spark.plans.extraction import _fixture_glob

    return f"""
SELECT media_ref,
       CASE WHEN height = 32 THEN width
            ELSE greatest(CAST(round(32.0 * width / height) AS INTEGER), 1) END AS width,
       CAST(32 AS INTEGER) AS height
FROM read_parquet('{_fixture_glob(sf_dir, 'line_images')}') ORDER BY media_ref
"""


def _clips_df(spark: SparkSession, kind: str) -> DataFrame:
    """Tiny deterministic binary-clip table (the audio/video decode itself
    is the documented stub; payloads just need to be stable bytes)."""
    rows = [
        (f"{kind}_{i:04d}", hashlib.sha256(f"{kind}|{i}".encode()).digest() * 8)
        for i in range(N_CLIPS)
    ]
    return spark.createDataFrame(rows, "media_ref string, payload binary")


def x_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_features(_clips_df(spark, "audio")).orderBy("media_ref")


def x_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        sample_video_frames(_clips_df(spark, "video"), n_frames=4)
        .select("media_ref", "frame_idx", "frame_mean")
        .orderBy("media_ref", "frame_idx")
    )


def _sfq(fn, oracle_fn=None):
    if oracle_fn is None:
        return (fn, None)
    return (fn, oracle_fn("/root/testdata/sf0.01"))


MEDIA_QUERIES = {
    "x_image_stats": _sfq(x_image_stats, x_image_stats_oracle),
    "x_image_resize": _sfq(x_image_resize, x_image_resize_oracle),
    "x_audio_features": (x_audio_features, None),
    "x_video_frames": (x_video_frames, None),
}
