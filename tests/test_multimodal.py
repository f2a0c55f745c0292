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


def test_ahash_perceptual_property_with_injected_decoder(spark):
    """With a REAL pixel decoder injected through the seam (payload =
    raw uint8 image bytes), near-identical images land within a few bits
    while structurally different images land far apart — the property
    that makes banded Hamming a usable near-dup join for media."""
    import numpy as np
    from pyspark.sql import functions as F

    from penr_oz_agent_memory_rust_spark.operators import multimodal as mm

    side = 32
    base = np.add.outer(np.arange(side), np.arange(side)) * 2.0  # gradient
    noisy = base.copy()
    noisy[0, 0] += 3.0  # imperceptible wiggle
    inverted = base[::-1, :]  # structurally different
    rows = [
        ("a", "image", bytes(base.astype(np.uint8).tobytes())),
        ("b", "image", bytes(noisy.astype(np.uint8).tobytes())),
        ("c", "image", bytes(inverted.astype(np.uint8).tobytes())),
    ]
    media = spark.createDataFrame(rows, "media_id string, kind string, payload binary")

    def decode(p: bytes):
        import numpy as _np

        return _np.frombuffer(p, dtype=_np.uint8)[: 32 * 32].reshape(32, 32).astype(float)

    hashed = mm.perceptual_hash(media, decode_pixels_fn=decode)
    hs = {r["media_id"]: list(r["phash"]) for r in hashed.collect()}

    def ham(x, y):
        return sum(bin(a ^ b).count("1") for a, b in zip(x, y))

    assert ham(hs["a"], hs["b"]) <= 2           # near-dup stays near
    assert ham(hs["a"], hs["c"]) >= 16          # different image is far
    pairs = {(r["u"], r["v"]): r["hamming"]
             for r in mm.phash_near_dup_pairs(hashed, max_bits=5, bands=8).collect()}
    assert ("a", "b") in pairs and pairs[("a", "b")] <= 2
    assert ("a", "c") not in pairs and ("b", "c") not in pairs


def test_ahash_python_twin_matches_spark(spark):
    from penr_oz_agent_memory_rust_spark.operators import multimodal as mm
    from penr_oz_agent_memory_rust_spark.sources.tables import load_table
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf, "documents").limit(5)
    media = mm.synthesize_media_from_documents(docs)
    hashed = {r["media_id"]: list(r["phash"]) for r in mm.perceptual_hash(media).collect()}
    for r in media.collect():
        expect = mm.average_hash_py(mm._fake_pixels(bytes(r["payload"])))
        assert hashed[r["media_id"]] == expect


def test_phash_band_values_cover_all_64_bits(spark):
    """Flipping ANY single bit must change exactly one band value — the
    banding decomposition partitions the 64 bits with no gaps/overlap
    (the pigeonhole recall guarantee depends on it)."""
    import numpy as np
    from pyspark.sql import functions as F

    from penr_oz_agent_memory_rust_spark.operators import multimodal as mm

    # craft two hashes differing in exactly one bit, per word/position set
    for word_idx, bit in [(0, 0), (0, 31), (1, 0), (1, 31), (0, 13), (1, 22)]:
        h1 = [0, 0]
        h2 = h1.copy()
        h2[word_idx] = 1 << (31 - bit)
        df = spark.createDataFrame(
            [("x", "image", h1), ("y", "image", h2)],
            "media_id string, kind string, phash array<bigint>",
        )
        got = mm.phash_near_dup_pairs(df, max_bits=1, bands=8).collect()
        assert len(got) == 1 and got[0]["hamming"] == 1, (word_idx, bit, got)
