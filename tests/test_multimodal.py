"""Multimodal plumbing tests: binary payload columns through mapInPandas."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_job_spark.operators.multimodal import (
    EMBED_DIM,
    FAKE_AUD_MAGIC,
    decode_image_meta,
    encode_fake_image,
    extract_features,
    frame_sample_plan,
    resize_plan,
    MEDIA_SCHEMA,
)


def _media_df(spark):
    rows = [
        (1, "image", "image/fake", encode_fake_image(1, 640, 480)),
        (2, "image", "image/fake", encode_fake_image(2, 100, 2000)),
        (3, "audio", "audio/fake", FAKE_AUD_MAGIC + b"\x00" * 8),
        (4, "image", "image/jpeg", b"\xff\xd8\xff\xe0 real jpeg header"),
        (5, "image", "image/fake", None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_image_meta(spark):
    out = decode_image_meta(_media_df(spark)).collect()
    by_id = {r["media_id"]: r for r in out}
    assert (by_id[1]["width"], by_id[1]["height"]) == (640, 480)
    assert (by_id[2]["width"], by_id[2]["height"]) == (100, 2000)
    assert by_id[3]["decode_error"] == "not an image"
    assert "imaging library" in by_id[4]["decode_error"]  # stub surfaces as data
    assert by_id[5]["decode_error"] == "null payload"


def test_resize_plan(spark):
    meta = decode_image_meta(_media_df(spark))
    out = {r["media_id"]: r for r in resize_plan(meta, max_side=512).collect()}
    assert (out[1]["target_width"], out[1]["target_height"]) == (512, 384)
    assert (out[2]["target_width"], out[2]["target_height"]) == (26, 512)
    assert out[3]["target_width"] is None  # non-images pass through as null


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, 3500), (2, 0)], "media_id long, duration_ms long")
    out = {r["media_id"]: r["frame_ts_ms"] for r in frame_sample_plan(df, fps=1.0).collect()}
    assert out[1] == [0, 1000, 2000, 3000]
    assert out[2] == [0]


def test_extract_features_deterministic(spark):
    feats = extract_features(_media_df(spark))
    rows = {r["media_id"]: r["feature"] for r in feats.collect()}
    assert len(rows[1]) == EMBED_DIM
    assert all(0.0 <= v <= 1.0 for v in rows[1])
    assert rows[5] is None
    # deterministic: same payload → same vector
    again = {r["media_id"]: r["feature"] for r in extract_features(_media_df(spark)).collect()}
    assert rows[1] == again[1]
