"""Multimodal plumbing tests: schema, Arrow batch shapes, deterministic
fake codec, stub boundary for real formats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_image_features,
    make_fake_image,
    resize_images,
    sample_video_frames,
    synthesize_media,
    _decode_payload,
)


def test_fake_media_schema(spark):
    df = synthesize_media(spark, 16)
    assert df.schema == MEDIA_SCHEMA
    assert df.count() == 16


def test_feature_extraction_deterministic(spark):
    df = synthesize_media(spark, 16).repartition(4)  # multiple Arrow batches
    feats = extract_image_features(df, bins=16)
    rows = {r.media_id: r.features for r in feats.collect()}
    assert len(rows) == 16
    assert all(len(v) == 16 for v in rows.values())
    assert all(abs(sum(v) - 1.0) < 1e-5 for v in rows.values())
    # run twice → identical (deterministic decode, partition-independent)
    rows2 = {r.media_id: r.features for r in extract_image_features(df.repartition(2), bins=16).collect()}
    assert rows == rows2
    # feature vectors feed straight into the KNN operator
    from vectordb_spark.operators.knn import knn

    q = rows[0]
    top = knn(feats, "features", q, 3, metric="EUCLIDEAN", id_col="media_id")
    assert top.select("media_id").head()[0] == 0


def test_resize_roundtrip(spark):
    df = synthesize_media(spark, 6)
    resized = resize_images(df, 4, 4)
    for r in resized.collect():
        px = _decode_payload(bytes(r.content), None)
        assert px.shape == (4, 4)
        assert r.meta.width == 4 and r.meta.height == 4


def test_real_format_hits_stub_boundary():
    with pytest.raises(NotImplementedError, match="codec"):
        _decode_payload(b"\x89PNG\r\n\x1a\n....", "png")


def test_video_frame_sampling(spark):
    rows = [
        (1, "video", b"VDBF" + b"\x00" * 8, ("VDBF", None, None, 3500, None)),
        (2, "video", b"VDBF" + b"\x00" * 8, ("VDBF", None, None, 900, None)),
        (3, "image", make_fake_image(3, 8, 8), ("VDBF", 8, 8, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sample_video_frames(df, every_ms=1000)
    got = sorted((r.media_id, r.frame_ts_ms) for r in frames.collect())
    assert got == [(1, 0), (1, 1000), (1, 2000), (1, 3000), (2, 0)]
