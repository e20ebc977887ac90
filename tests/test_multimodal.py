"""Multimodal operator tests: schema/batch plumbing is real; audio
decode is genuinely computed (PCM16), image decode falls back to the
documented deterministic stub, video frame sampling fans out rows."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nyc_taxi_etl_spark.operators.multimodal import (
    audio_features,
    image_features,
    resize_images,
    sample_video_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synthesize_media(spark, n=90, seed=42).repartition(4).cache()
    df.count()
    return df


def test_media_kinds_balanced(media):
    counts = {r["kind"]: r["n"] for r in media.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert counts == {"image": 30, "audio": 30, "video": 30}


def test_image_features_deterministic_and_complete(media):
    f1 = image_features(media).toPandas().sort_values("media_id").reset_index(drop=True)
    f2 = image_features(media).toPandas().sort_values("media_id").reset_index(drop=True)
    assert len(f1) == 30
    assert f1.equals(f2)
    assert ((f1["mean_intensity"] > 0) & (f1["mean_intensity"] < 255)).all()
    assert f1["ahash"].str.len().eq(16).all()
    assert f1["ahash"].nunique() > 25  # random images → distinct hashes


def test_resize_images_shape(media, spark):
    out = resize_images(media, 4, 5).toPandas()
    assert len(out) == 30
    assert (out["width"] == 4).all() and (out["height"] == 5).all()
    for blob in out["content"]:
        assert len(bytes(blob)) == 4 * 5 * 3


def test_audio_features_real_decode(media):
    out = audio_features(media).toPandas()
    assert len(out) == 30
    # sine waves at amplitude 12000: RMS ≈ 12000/√2 within tolerance
    assert ((out["rms"] > 6000) & (out["rms"] < 10000)).all()
    assert ((out["duration_s"] > 0.02) & (out["duration_s"] < 0.3)).all()
    assert (out["n_samples"] == (out["duration_s"] * out["sample_rate"]).round()).all()
    assert ((out["zero_crossing_rate"] > 0) & (out["zero_crossing_rate"] < 0.5)).all()


def test_video_frame_sampling_fanout(media):
    frames = sample_video_frames(media, every_n=2).toPandas()
    per_vid = frames.groupby("media_id").size()
    assert len(per_vid) == 30
    meta = {r["media_id"]: r["n_frames"] for r in media.filter("kind='video'").collect()}
    for mid, got in per_vid.items():
        assert got == -(-meta[mid] // 2)  # ceil(n_frames / every_n)
    fsz = 8 * 6 * 3
    assert all(len(bytes(b)) == fsz for b in frames["frame"])


def test_metadata_only_query_prunes_blob_column(media, spark, tmp_path):
    """Width/height filters must not read the blob column: check the
    parquet scan's ReadSchema excludes `content`."""
    p = str(tmp_path / "media.parquet")
    media.write.parquet(p)
    q = spark.read.parquet(p).filter(F.col("kind") == "image").select("media_id", "width", "height")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan
    assert q.count() == 30
