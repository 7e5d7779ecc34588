"""Multimodal plumbing: Arrow binary batches through mapInPandas,
deterministic fake decode, frame-sampling plan."""

from __future__ import annotations

import pytest

from turboxsl_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample,
    gen_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return gen_media(spark, n=30).cache()


def test_extract_features_shape_and_determinism(spark, media):
    a = extract_features(media).toPandas().sort_values("media_id").reset_index(drop=True)
    b = extract_features(media).toPandas().sort_values("media_id").reset_index(drop=True)
    assert len(a) == 30
    assert all(len(f) == FEATURE_DIM for f in a["features"])
    assert all(0.0 <= x <= 1.0 for f in a["features"] for x in f)
    for fa, fb in zip(a["features"], b["features"]):
        assert list(fa) == list(fb)
    assert (a["n_bytes"] > 0).all()


def test_real_decoder_is_explicit_stub(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|not installed"):
        extract_features(media, decoder="real").collect()


def test_resize_images_aspect_and_bounds(spark, media):
    from turboxsl_spark.operators.multimodal import resize_images

    out = resize_images(media, max_dim=100).toPandas()
    src = (
        media.where("kind = 'image'")
        .selectExpr("media_id", "meta.width AS w0", "meta.height AS h0")
        .toPandas()
        .set_index("media_id")
    )
    assert len(out) == len(src)
    for _, r in out.iterrows():
        w0, h0 = src.loc[r["media_id"], ["w0", "h0"]]
        assert r["width"] <= 100 and r["height"] <= 100
        assert r["width"] <= w0 and r["height"] <= h0  # never upscale
        # aspect preserved within integer truncation
        if max(w0, h0) > 100:
            scale = 100 / max(w0, h0)
            assert abs(r["width"] - int(w0 * scale)) <= 1
            assert abs(r["height"] - int(h0 * scale)) <= 1
        else:
            assert (r["width"], r["height"]) == (w0, h0)
    with pytest.raises(Exception, match="NotImplementedError|not installed"):
        resize_images(media, decoder="real").collect()


def test_frame_sample_plan(spark, media):
    fs = frame_sample(media, every_n=30).toPandas()
    assert (fs["frame_idx"] % 30 == 0).all()
    n_videos = media.where("kind = 'video'").count()
    assert fs["media_id"].nunique() == n_videos
