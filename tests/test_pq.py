"""Product quantization: codebook determinism, encode invariants,
reconstruction-error monotonicity, ADC recall vs brute force, exact
re-rank, and the 4d/m-byte compression claim."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import memory_store, pq
from penr_oz_agent_memory_rust_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def books(emb):
    return pq.train_pq_codebooks(emb, m=8, ksub=64, n_iters=5)


@pytest.fixture(scope="module")
def codes(emb, books):
    return pq.encode_pq(emb, books).cache()


def test_train_shape_and_determinism(emb, books):
    assert books.shape == (8, 64, 8) and books.dtype == np.float32
    again = pq.train_pq_codebooks(emb, m=8, ksub=64, n_iters=5)
    np.testing.assert_array_equal(books, again)


def test_train_dim_not_divisible_raises(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq.train_pq_codebooks(emb, m=7)


def test_encode_invariants(emb, codes):
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 64 for c in r["codes"])
    again = {r["vec_id"]: r["codes"] for r in pq.encode_pq(emb, pq.train_pq_codebooks(emb, m=8, ksub=64, n_iters=5)).collect()}
    for r in rows:
        assert again[r["vec_id"]] == r["codes"]


def test_reconstruction_error_shrinks_with_ksub(emb):
    X = np.asarray([r["embedding"] for r in emb.select("embedding").collect()], dtype=np.float32)

    def mse(ksub):
        b = pq.train_pq_codebooks(emb, m=8, ksub=ksub, n_iters=5)
        C = np.asarray(
            [r["codes"] for r in pq.encode_pq(emb, b).orderBy("vec_id").collect()],
            dtype=np.int64,
        )
        R = pq.decode_pq_expr(b)(C)
        return float(((X - R) ** 2).mean())

    e4, e64 = mse(4), mse(64)
    assert e64 < e4 * 0.7, (e4, e64)


def test_adc_self_match_and_recall(emb, books, codes):
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    adc = [r["vec_id"] for r in pq.pq_search(codes, books, qv, k=20).collect()]
    assert adc[0] == 0  # self is nearest under l2 ADC
    # exact l2 top-20 driver-side
    X = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float32) for r in emb.collect()}
    q = np.asarray(qv, dtype=np.float32)
    exact = sorted(X, key=lambda i: float(((X[i] - q) ** 2).sum()))[:20]
    overlap = len(set(adc) & set(exact))
    # uniform-random vectors are PQ's worst case (no subspace structure to
    # quantize); 10/20 raw-ADC recall here, and the two-stage contract
    # (test_rerank_matches_exact_cosine) restores >=8/10 against exact
    assert overlap >= 10, f"ADC top-20 recall too low: {overlap}/20"


def test_rerank_matches_exact_cosine(emb, books, codes):
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    approx = [
        r["vec_id"]
        for r in pq.pq_search_rerank(codes, emb, books, qv, k=10, kprime=100).collect()
    ]
    mem = emb.select(
        F.col("vec_id").cast("string").alias("id"),
        F.lit("t").alias("text"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.lit(None).cast("string").alias("session"),
        "embedding",
        F.lit(None).cast("timestamp").alias("created_at"),
    )
    exact = [int(r["id"]) for r in memory_store.search(mem, qv, limit=10).collect()]
    assert approx[0] == exact[0] == 0
    overlap = len(set(approx) & set(exact))
    assert overlap >= 8, f"re-ranked top-10 overlap too low: {overlap}"


def test_dot_metric_descends(emb, books, codes):
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    rows = pq.pq_search(codes, books, qv, k=10, metric="dot").collect()
    vals = [r["adc"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert rows[0]["vec_id"] == 0


def test_query_dim_mismatch_raises(books, codes):
    with pytest.raises(ValueError, match="query dim"):
        pq.pq_search(codes, books, [0.0] * 13)


def test_codes_storage_compression(emb, codes, tmp_path):
    full, small = str(tmp_path / "full"), str(tmp_path / "small")
    emb.select("vec_id", "embedding").write.parquet(full)
    codes.write.parquet(small)
    size = lambda p: sum(os.path.getsize(f) for f in glob.glob(f"{p}/*.parquet"))
    # 64 float32 (256 B) -> 8 smallint codes; parquet overhead eats some of
    # the raw 16x but the table must still land well under half
    assert size(small) < 0.45 * size(full), (size(small), size(full))
