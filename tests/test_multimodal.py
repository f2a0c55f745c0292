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


def test_custom_decoder_plugs_in(spark, media):
    """The decode_fn seam (r3 VERDICT ask): a user-supplied codec runs
    inside the Arrow batches without touching the operator, and the stub
    NotImplementedError never fires when one is given."""

    def byte_histogram_decoder(payload: bytes):
        # a stand-in "real codec": 16-bin byte histogram of the blob
        counts = [0.0] * 16
        for b in payload:
            counts[b % 16] += 1.0
        return counts

    rows = {
        r["media_id"]: r["features"]
        for r in multimodal.extract_features(
            media, fake=False, decode_fn=byte_histogram_decoder
        ).collect()
    }
    assert set(rows) == {"image-1", "image-2"}
    assert all(len(v) == 16 for v in rows.values())
    # histogram of a 128-byte blob sums to 128 — proves the custom fn ran
    assert all(abs(sum(v) - 128.0) < 1e-6 for v in rows.values())


def test_custom_resizer_plugs_in(spark):
    media = spark.createDataFrame(
        [("m1", bytes(range(10)))], "media_id string, payload binary"
    )

    def head_resizer(payload: bytes, width: int, height: int) -> bytes:
        return (payload + b"\x00" * (width * height))[: width * height]

    row = multimodal.resize_media(media, 4, 4, fake=False, resize_fn=head_resizer).first()
    assert bytes(row["resized"]) == bytes(range(10)) + b"\x00" * 6


def test_sample_frames_shape(spark, media):
    frames = multimodal.sample_frames(media, every_n_bytes=16, max_frames=3).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {"image-1", "image-2"}
    for rows in by_media.values():
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 1, 2]
        assert all(len(r["frame"]) == 16 for r in rows)


def test_resize_media_exact_size_and_short_blob(spark):
    from penr_oz_agent_memory_rust_spark.operators.multimodal import resize_media

    media = spark.createDataFrame(
        [("m1", bytes(range(128))), ("m2", b"\x07"), ("m3", None)],
        "media_id string, payload binary",
    )
    rows = {r["media_id"]: r for r in resize_media(media, 8, 8).collect()}
    assert all(len(r["resized"]) == 64 for r in rows.values())
    assert bytes(rows["m1"]["resized"]) == bytes(range(0, 128, 2))  # stride-2
    assert bytes(rows["m2"]["resized"]) == b"\x07" * 64             # repeated
    assert bytes(rows["m3"]["resized"]) == b"\x00" * 64             # null blob
