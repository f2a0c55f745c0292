"""Bloom sketch: no false negatives, exact routing, sizing math."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import bloom, dedup

DOCS = [
    (i, t)
    for i, t in enumerate(
        ["alpha beta gamma %d" % (i % 40) for i in range(100)]  # 40 distinct texts
    )
]


def _split(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    seen = dedup.exact_dedup(docs.filter(F.col("doc_id") < 50)).select("fp")
    batch = docs.filter(F.col("doc_id") >= 50)
    return docs, seen, batch


def test_bloom_matches_exact_incremental(spark):
    docs, seen, batch = _split(spark)
    exact = {
        (r["doc_id"], r["fp"])
        for r in dedup.incremental_exact_dedup(batch, seen).collect()
    }
    sketched = {
        (r["doc_id"], r["fp"])
        for r in bloom.incremental_bloom_dedup(batch, seen).collect()
    }
    assert sketched == exact


def test_bloom_no_false_negatives(spark):
    """Every fingerprint inserted into the sketch MUST probe positive —
    the property the exactness of incremental_bloom_dedup rests on."""
    fps = spark.range(5000).select(
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("fp")
    )
    sketch = bloom.build_bloom(fps, "fp", m_bits=1 << 16, k=4)
    probe = bloom.bloom_probe_udf(fps, sketch, 1 << 16, 4)
    n_missed = fps.filter(~probe(F.col("fp"))).count()
    assert n_missed == 0


def test_bloom_fpp_is_bounded(spark):
    """Disjoint probe set: false-positive rate stays near the m/n design
    point (1<<20 bits over 5k items is far below 1% fpp; allow slack)."""
    inserted = spark.range(5000).select(
        F.conv(F.substring(F.md5(F.concat(F.lit("in|"), F.col("id").cast("string"))), 1, 15), 16, 10)
        .cast("bigint")
        .alias("fp")
    )
    others = spark.range(5000).select(
        F.conv(F.substring(F.md5(F.concat(F.lit("out|"), F.col("id").cast("string"))), 1, 15), 16, 10)
        .cast("bigint")
        .alias("fp")
    )
    sketch = bloom.build_bloom(inserted, "fp", m_bits=1 << 20, k=4)
    probe = bloom.bloom_probe_udf(others, sketch, 1 << 20, 4)
    n_fp = others.filter(probe(F.col("fp"))).count()
    assert n_fp <= 50  # 1% of 5000; design fpp is ~1e-5 here


def test_optimal_bits_power_of_two_and_monotone():
    a = bloom.optimal_bits(10_000, 0.01)
    b = bloom.optimal_bits(1_000_000, 0.01)
    assert a & (a - 1) == 0 and b & (b - 1) == 0
    assert b > a
    assert bloom.optimal_bits(10_000, 0.001) >= a


def test_positions_within_range():
    w, b = bloom._positions(np.array([0, 1, 2**59, 123456789], dtype=np.int64), 1 << 16, 4)
    assert w.shape == (4, 4) and b.shape == (4, 4)
    assert int(w.max()) < (1 << 16) // 64
    assert np.all([bin(int(x)).count("1") == 1 for x in b.ravel()])
