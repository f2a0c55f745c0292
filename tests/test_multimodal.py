"""Multimodal plumbing: schema, batch shape, deterministic fake decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import multimodal


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        [(1, "first doc"), (2, "second doc")], "doc_id bigint, text string"
    )
    return multimodal.synthesize_media_from_documents(docs)


def test_media_schema_and_payloads(spark, media):
    rows = media.collect()
    assert {r["media_id"] for r in rows} == {"image-1", "image-2"}
    assert all(isinstance(r["payload"], (bytes, bytearray)) for r in rows)
    assert all(len(r["payload"]) == 128 for r in rows)  # 16-byte md5 × 8
    assert rows[0]["meta"]["src_doc"] in {"1", "2"}


def test_extract_features_deterministic(spark, media):
    f1 = {r["media_id"]: r["features"] for r in multimodal.extract_features(media).collect()}
    f2 = {r["media_id"]: r["features"] for r in multimodal.extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == multimodal.FEATURE_DIM for v in f1.values())
    assert f1["image-1"] != f1["image-2"]


def test_real_decoder_is_stubbed(spark, media):
    with pytest.raises(Exception) as exc_info:
        multimodal.extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_sample_frames_shape(spark, media):
    frames = multimodal.sample_frames(media, every_n_bytes=16, max_frames=3).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {"image-1", "image-2"}
    for rows in by_media.values():
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 1, 2]
        assert all(len(r["frame"]) == 16 for r in rows)
