"""Multimodal plumbing tests: schema, Arrow batch shape, stub decode
behavior, byte-based repartitioning."""

from __future__ import annotations

import pytest

from nursinghome_data_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    media_repartition,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x00\x01payload-one", ("image/png", 64, 64, None)),
        (2, b"another-payload", ("video/mp4", 1920, 1080, 3500)),
        (3, None, ("image/png", None, None, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_stub(media):
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert len(feats) == 3
    assert len(feats[1].feature) == FEATURE_DIM
    assert feats[1].mime == "image/png"
    assert feats[3].feature == [0.0] * FEATURE_DIM  # NULL payload → zeros
    # deterministic: same payload → same feature
    again = {r.media_id: r for r in extract_features(media).collect()}
    assert again[1].feature == feats[1].feature


def test_extract_features_real_decode_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(media, decode_stub=False).collect()


def test_sample_frames(media):
    frames = sample_frames(media, every_ms=1000).collect()
    # only media 2 has a duration: 3500ms → frames at 0,1000,2000,3000
    assert [f.frame_ts_ms for f in frames] == [0, 1000, 2000, 3000]
    assert all(f.media_id == 2 for f in frames)
    assert all(isinstance(f.frame, (bytes, bytearray)) for f in frames)


def test_media_repartition(media):
    out = media_repartition(media, target_bytes=10)
    assert out.count() == 3
    assert out.rdd.getNumPartitions() >= 2
