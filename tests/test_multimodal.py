"""Multimodal plumbing tests: schema, batch shape, determinism, stub
contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_ld_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    resize_plan,
    sample_frames,
    synthesize_media,
)


def test_media_schema_and_determinism(spark):
    a = synthesize_media(spark, n=30).collect()
    b = synthesize_media(spark, n=30).collect()
    assert len(a) == 30
    by_id = {r["media_id"]: r for r in a}
    for r in b:
        assert bytes(by_id[r["media_id"]]["payload"]) == bytes(r["payload"])
    kinds = {r["kind"] for r in a}
    assert kinds == {"image", "audio", "video"}
    assert a[0]["meta"]["sample_rate"] == 16000


def test_feature_extraction_shape(spark):
    media = synthesize_media(spark, n=24)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 24
    for r in rows:
        assert len(r["feature"]) == FEATURE_DIM
        assert all(-1.0 <= x < 1.0 for x in r["feature"])
        assert r["n_bytes"] > 0
    # deterministic across runs
    again = {r["media_id"]: list(r["feature"]) for r in extract_features(media).collect()}
    for r in rows:
        assert [pytest.approx(x) for x in again[r["media_id"]]] == list(r["feature"])


def test_features_feed_similarity_ops(spark):
    from json_ld_spark.operators.similarity import brute_force_topk

    media = synthesize_media(spark, n=24)
    feats = extract_features(media).withColumnRenamed("media_id", "vec_id")
    q = feats.filter(F.col("vec_id") == 0).collect()[0]["feature"]
    top = brute_force_topk(feats, q, k=3, vec_col="feature")
    rows = top.collect()
    assert rows[0]["vec_id"] == 0 and abs(rows[0]["cosine"] - 1.0) < 1e-3


def test_strict_codec_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"xxxx", None, strict=True)


def test_frame_sampling(spark):
    media = synthesize_media(spark, n=30)
    frames = sample_frames(media, every_n=5)
    rows = frames.collect()
    assert rows, "video rows expected"
    for r in rows:
        assert r["frame_idx"] % 5 == 0 and r["frame_idx"] < r["n_frames"]


def test_resize_plan(spark):
    media = synthesize_media(spark, n=30)
    plan = resize_plan(media, max_side=128).collect()
    assert plan
    for r in plan:
        assert max(r["target_width"], r["target_height"]) <= 128
        # aspect ratio preserved within rounding
        ar_in = r["width"] / r["height"]
        ar_out = r["target_width"] / r["target_height"]
        assert abs(ar_in - ar_out) / ar_in < 0.05
