"""Multimodal plumbing tests: schema/shape contracts, determinism, and the
explicit NotImplementedError on the real-codec path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fusionspark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return MM.synth_media(spark, sf_dir).cache()


def test_media_schema_and_kinds(media):
    assert dict(media.dtypes)["payload"] == "binary"
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    # payloads are non-empty and deterministic
    a = media.filter(F.col("media_id") == 3).select("payload").first()["payload"]
    b = media.filter(F.col("media_id") == 3).select("payload").first()["payload"]
    assert bytes(a) == bytes(b) and len(a) > 0


def test_image_features_deterministic(media):
    f1 = {r["media_id"]: r["ahash"] for r in MM.image_features(media).collect()}
    f2 = {r["media_id"]: r["ahash"] for r in MM.image_features(media).collect()}
    assert f1 == f2
    assert len(f1) == media.filter(F.col("kind") == "image").count()


def test_resize_shape_contract(media):
    rows = MM.resize_images(media, target=(8, 8)).collect()
    assert rows
    for r in rows:
        assert len(r["resized"]) == 64  # 8×8 uint8 plane
        assert (r["out_width"], r["out_height"]) == (8, 8)


def test_frame_grid_matches_duration(media):
    frames = MM.sample_frames(media, every_ms=1000)
    counts = {r["media_id"]: r["cnt"] for r in
              frames.groupBy("media_id").agg(F.count("*").alias("cnt")).collect()}
    durs = {r["media_id"]: r["duration_ms"] for r in
            media.filter(F.col("kind") == "video").collect()}
    import math
    for mid, dur in durs.items():
        assert counts[mid] == math.ceil(dur / 1000)


def test_real_codec_path_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        MM.decode_real(b"abc", "image/jpeg")
