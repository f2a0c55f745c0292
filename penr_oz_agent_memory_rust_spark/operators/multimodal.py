"""Multimodal column plumbing (north-star, ★ — not in the reference).

Images/audio/video are opaque `binary` columns with typed metadata
(schemas.MEDIA_SCHEMA). The Spark-side plumbing — schema, partition-friendly
batch iteration, Arrow transfer shape, UDF signatures — is real and tested;
the actual codec work is STUBBED (image/audio libraries are not in this
container): `decode_media` raises NotImplementedError unless a deterministic
fake decoder is requested, which produces stable pseudo-pixels from the
payload hash so downstream operators are testable end-to-end.

Scale notes: all media ops run through mapInPandas so each task handles an
Arrow batch of blobs; binary payloads never pass through Python row-by-row,
and feature vectors come back as array<float> columns ready for the KNN /
dedup operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 16

FEATURES_SCHEMA = "media_id string, kind string, features array<float>"
FRAMES_SCHEMA = "media_id string, frame_idx int, frame binary"


def synthesize_media_from_documents(
    docs: DataFrame, kind: str = "image", id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic fake media table: payload = md5 bytes of the text,
    repeated — a stand-in blob for plumbing tests."""
    return docs.select(
        F.concat(F.lit(f"{kind}-"), F.col(id_col).cast("string")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.repeat(F.unhex(F.md5(F.col(text_col))), 8).cast("binary").alias("payload"),
        F.lit(f"application/x-fake-{kind}").alias("mime"),
        F.create_map(F.lit("src_doc"), F.col(id_col).cast("string")).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic pseudo-decode: hash the blob into a stable float vector.
    Stands in for a real image/audio decoder (REAL DECODER NOT AVAILABLE —
    see module docstring)."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(
    media: DataFrame,
    fake: bool = True,
    dim: int = FEATURE_DIM,
    decode_fn=None,
) -> DataFrame:
    """Decode + feature-extract as a mapInPandas batch stage.

    `decode_fn` is the real-codec seam (same shape as the pluggable
    embedding providers, sources/embedding_providers.py): a picklable
    `bytes -> sequence[float]` of length `dim` that runs inside each Arrow
    batch — a user with PIL/librosa on the cluster plugs their decoder in
    without touching this operator. Precedence: `decode_fn` when given,
    else the deterministic fake when `fake=True`, else NotImplementedError
    (no codec libraries in this container — STUBBED).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_fn is not None:
                dec = decode_fn
            elif fake:
                dec = lambda p: _fake_decode(p, dim)  # noqa: E731
            else:
                raise NotImplementedError(
                    "real media decoding requires codec libraries not present in "
                    "this environment — pass decode_fn=<your codec> to plug one in"
                )
            feats = [
                [float(x) for x in dec(p if p is not None else b"")]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id string, kind string, features array<float>"
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 16, max_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing: slice the payload into fixed-size 'frames'.
    For real video this is where ffmpeg keyframe extraction would run."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                blob = payload or b""
                for i in range(min(max_frames, max(1, len(blob) // every_n_bytes))):
                    out_id.append(mid)
                    out_idx.append(i)
                    out_frame.append(blob[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": out_id, "frame_idx": out_idx, "frame": out_frame})

    return media.select("media_id", "payload").mapInPandas(run, schema=FRAMES_SCHEMA)


RESIZED_SCHEMA = "media_id string, width int, height int, resized binary"


def resize_media(
    media: DataFrame,
    width: int = 8,
    height: int = 8,
    fake: bool = True,
    resize_fn=None,
) -> DataFrame:
    """Resize plumbing as a mapInPandas batch stage: blob in, (width x
    height)-byte thumbnail blob out plus the declared dimensions.

    `resize_fn` is the real-codec seam: a picklable
    `(bytes, width, height) -> bytes` (PIL/opencv decode-resize-reencode)
    run per Arrow batch. Precedence: `resize_fn` when given, else the
    deterministic fake when `fake=True` — it 'resizes' by striding the
    payload bytes down to exactly width*height bytes (repeating when
    short): stable, size-correct output that exercises the full Spark
    plumbing (binary Arrow transfer both ways, metadata columns, batch
    iteration) — else NotImplementedError (no codecs in this container).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if resize_fn is None and not fake:
                raise NotImplementedError(
                    "real image resizing requires codec libraries not present in "
                    "this environment — pass resize_fn=<your codec> to plug one in"
                )
            out = []
            for payload in pdf["payload"]:
                if resize_fn is not None:
                    out.append(bytes(resize_fn(payload or b"", width, height)))
                    continue
                blob = payload or b"\x00"
                reps = -(-target // len(blob))  # ceil-div: repeat short blobs
                stretched = (blob * reps)[: target * max(1, len(blob) // target)]
                step = max(1, len(stretched) // target)
                out.append(stretched[::step][:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "resized": out,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


def _fake_pixels(payload: bytes, side: int = 32) -> np.ndarray:
    """Deterministic pseudo-pixel grid (stands in for a real image decode,
    same contract as _fake_decode): equal payloads yield equal images."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(side, side)).astype(np.float64)


def average_hash_py(pixels: np.ndarray, grid: int = 8) -> list[int]:
    """Classic aHash: mean-pool the grayscale image onto a grid×grid block
    matrix, threshold each block against the overall mean, pack the bits
    MSB-first 32-per-word (the same packing as quantize.binarize_py, so
    quantize.hamming_expr scores these directly). Pure NumPy — no codec."""
    h, w = pixels.shape
    bh, bw = max(1, h // grid), max(1, w // grid)
    blocks = pixels[: bh * grid, : bw * grid].reshape(grid, bh, grid, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).astype(int).ravel()
    words = []
    for wv in range((grid * grid + 31) // 32):
        acc = 0
        for j in range(32):
            i = wv * 32 + j
            acc = acc * 2 + (int(bits[i]) if i < len(bits) else 0)
        words.append(acc)
    return words


def perceptual_hash(
    media: DataFrame,
    decode_pixels_fn=None,
    fake: bool = True,
    grid: int = 8,
) -> DataFrame:
    """Per-media perceptual (average) hash: decode to a grayscale pixel
    matrix inside each Arrow batch, aHash it to grid² bits packed as
    array<bigint>. `decode_pixels_fn` (picklable `bytes -> 2-D ndarray`)
    is the real-codec seam; the deterministic fake keeps the plumbing
    testable without codec libraries (REAL DECODER NOT AVAILABLE — module
    docstring). Output: (media_id, kind, phash)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_pixels_fn is not None:
                dec = decode_pixels_fn
            elif fake:
                dec = _fake_pixels
            else:
                raise NotImplementedError(
                    "real image decoding requires codec libraries not present "
                    "in this environment — pass decode_pixels_fn=<your codec>"
                )
            hashes = [
                average_hash_py(np.asarray(dec(p if p is not None else b""), dtype=np.float64), grid)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "phash": hashes}
            )

    from penr_oz_agent_memory_rust_spark.functions import hashing

    # rebalance: a single-file scan arrives as ONE partition, which runs
    # the whole per-row decode+aHash batch stage on a single core (r10
    # profile: a 2.3 s single-task stage dominated media_phash_dedup);
    # no-op at real scale where the media scan already has many splits
    return hashing.cpu_rebalance(media.select("media_id", "kind", "payload")).mapInPandas(
        run, schema="media_id string, kind string, phash array<bigint>"
    )


def phash_near_dup_pairs(
    hashed: DataFrame,
    max_bits: int = 5,
    bands: int = 8,
    id_col: str = "media_id",
    max_bucket: int = 200,
) -> DataFrame:
    """Near-duplicate media pairs by Hamming distance over the perceptual
    hash — delegates to the shared banded-Hamming join
    (operators/quantize.py hamming_near_dup_pairs): SimHash-style banding
    with pigeonhole-exact recall for max_bits <= bands - 1, verified with
    bit_count(xor). Output: (u, v, hamming), u < v."""
    from penr_oz_agent_memory_rust_spark.operators.quantize import (
        hamming_near_dup_pairs,
    )

    return hamming_near_dup_pairs(
        hashed,
        max_bits=max_bits,
        bands=bands,
        id_col=id_col,
        code_col="phash",
        max_bucket=max_bucket,
    )
