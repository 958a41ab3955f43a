"""Multimodal column plumbing: real image decode/resize, stubbed
audio/video decode with real Spark-side batching."""

from calamari_spark.plans import mediaplans as M

SF = "/root/testdata/sf0.001"


def test_image_stats_match_stored_dims(spark):
    from calamari_spark.plans.extraction import load_interleaved

    _, media = load_interleaved(spark, SF)
    stored = {
        r["media_ref"]: (r["width"], r["height"])
        for r in media.select("media_ref", "width", "height").collect()
    }
    got = M.x_image_stats(spark, SF).collect()
    assert len(got) == len(stored)
    for r in got:
        assert (r["width"], r["height"]) == stored[r["media_ref"]]


def test_image_resize_preserves_aspect(spark):
    from calamari_spark.plans.extraction import load_interleaved

    _, media = load_interleaved(spark, SF)
    orig = {r["media_ref"]: (r["width"], r["height"]) for r in
            media.select("media_ref", "width", "height").collect()}
    for r in M.x_image_resize(spark, SF).limit(50).collect():
        w0, h0 = orig[r["media_ref"]]
        assert r["height"] == 32
        assert abs(r["width"] - round(32 / h0 * w0)) <= 1


def test_audio_features_deterministic(spark):
    a = [r.asDict() for r in M.x_audio_features(spark, SF).collect()]
    b = [r.asDict() for r in M.x_audio_features(spark, SF).collect()]
    assert a == b and len(a) == M.N_CLIPS
    for r in a:
        assert r["n_samples"] == 256
        assert 0 < r["rms"] <= 1 and 0 < r["peak"] <= 1


def test_video_frames_shape(spark):
    rows = M.x_video_frames(spark, SF).collect()
    assert len(rows) == M.N_CLIPS * 4
    refs = {r["media_ref"] for r in rows}
    assert len(refs) == M.N_CLIPS
    assert {r["frame_idx"] for r in rows} == {0, 1, 2, 3}
