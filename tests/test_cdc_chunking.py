from __future__ import annotations

import hashlib
import re

from penr_oz_agent_memory_rust_spark.operators.text_ops import cdc_chunk_documents


def _norm(t):
    t = re.sub(r"[^a-z0-9 ]", "", t.lower())
    return re.sub(r" +", " ", t).strip()


def _ref_chunks(t, gram, modulus):
    n = _norm(t)
    bounds = [
        i
        for i in range(gram, len(n))
        if int(hashlib.md5(n[i - gram : i].encode()).hexdigest()[:15], 16) % modulus
        == 0
    ]
    out, prev = [], 0
    for j, b in enumerate(bounds):
        out.append((j, prev + 1, b - prev, hashlib.md5(n[prev:b].encode()).hexdigest()))
        prev = b
    if len(n) - prev >= 1:
        out.append(
            (
                len(bounds),
                prev + 1,
                len(n) - prev,
                hashlib.md5(n[prev:].encode()).hexdigest(),
            )
        )
    return out


def test_cdc_matches_reference_implementation(spark):
    text = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the woods tonight while seventeen owls watch in silence"
    )
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got = sorted(
        (r.chunk_idx, r.chunk_start, r.chunk_len, r.chunk_fp)
        for r in cdc_chunk_documents(df, gram=4, modulus=8).collect()
    )
    assert got == sorted(_ref_chunks(text, 4, 8))


def test_cdc_chunks_reassemble_document(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rows = sorted(
        cdc_chunk_documents(df, gram=4, modulus=8).collect(),
        key=lambda r: r.chunk_idx,
    )
    # contiguous, non-overlapping, covering 1..len(norm)
    pos = 1
    for r in rows:
        assert r.chunk_start == pos
        pos += r.chunk_len
    assert pos - 1 == len(_norm(text))


def test_cdc_short_and_null_docs(spark):
    df = spark.createDataFrame(
        [(1, "tiny"), (2, None), (3, "")], "doc_id bigint, text string"
    )
    rows = cdc_chunk_documents(df, gram=8, modulus=8).collect()
    assert [(r.doc_id, r.chunk_idx, r.chunk_len) for r in rows] == [(1, 0, 4)]


def test_cdc_boundaries_resync_after_insertion(spark):
    base = "one two three four five six seven eight nine ten " * 4
    edited = "INSERTED PREFIX " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id bigint, text string"
    )
    rows = cdc_chunk_documents(df, gram=4, modulus=8).collect()
    fps1 = {r.chunk_fp for r in rows if r.doc_id == 1}
    fps2 = {r.chunk_fp for r in rows if r.doc_id == 2}
    # content-defined boundaries re-synchronize: most original chunks keep
    # their fingerprints despite the shifted offsets
    assert len(fps1 & fps2) >= len(fps1) - 2
