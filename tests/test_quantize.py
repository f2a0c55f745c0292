"""Int8 quantization: round-trip error bounds, ranking preservation,
storage reduction."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import memory_store, quantize
from penr_oz_agent_memory_rust_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_roundtrip_error_bounded(spark, emb):
    q = quantize.quantize_table(emb, keep_original=True)
    err = q.select(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                quantize.dequantize_expr(F.col("q_vec"), F.col("q_scale")),
                lambda a, b: F.abs(a - b),
            ),
            F.lit(0.0).cast("double"),
            lambda acc, x: F.greatest(acc, x.cast("double")),
        ).alias("max_err"),
        F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x))).alias("max_abs"),
    ).collect()
    # per-element error <= scale/2 = max_abs/254
    for r in err:
        assert r["max_err"] <= r["max_abs"] / 254 + 1e-7


def test_quantized_ranking_close_to_exact(spark, emb):
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    qt = quantize.quantize_table(emb)
    approx = [r["vec_id"] for r in quantize.quantized_search(qt, qv, k=10).collect()]
    mem = emb.select(
        F.col("vec_id").cast("string").alias("id"),
        F.lit("t").alias("text"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.lit(None).cast("string").alias("session"),
        "embedding",
        F.lit(None).cast("timestamp").alias("created_at"),
    )
    exact = [int(r["id"]) for r in memory_store.search(mem, qv, limit=10).collect()]
    assert approx[0] == exact[0] == 0  # self-match survives quantization
    overlap = len(set(approx) & set(exact))
    assert overlap >= 8, f"quantized top-10 overlap too low: {overlap}"


def test_quantized_storage_smaller(spark, emb, tmp_path):
    full, quant = str(tmp_path / "full"), str(tmp_path / "quant")
    emb.write.parquet(full)
    quantize.quantize_table(emb).write.parquet(quant)
    import glob, os

    size = lambda p: sum(os.path.getsize(f) for f in glob.glob(f"{p}/*.parquet"))
    assert size(quant) < 0.55 * size(full), (size(quant), size(full))


def test_zero_vector_quantizes_to_zeros(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "vec_id bigint, embedding array<float>")
    row = quantize.quantize_table(df).first()
    assert row["q_vec"] == [0, 0, 0] and row["q_scale"] == 0.0


# ------------------------------------------------------------- binary (1-bit)


def test_binarize_matches_python_twin(spark, emb):
    bt = quantize.binarize_table(emb, keep_original=True).limit(20).collect()
    for r in bt:
        assert list(r["b_vec"]) == quantize.binarize_py([float(x) for x in r["embedding"]])


def test_binarize_packing_shape_and_tail(spark):
    # 40 dims -> 2 words; tail bits (40..63) must be zero; ties at 0 -> bit 0
    vec = [1.0] * 40
    df = spark.createDataFrame([(1, vec)], "vec_id bigint, embedding array<float>")
    row = df.select(quantize.binarize_expr(F.col("embedding"), 40).alias("b")).first()
    assert row["b"] == [0xFFFFFFFF, 0xFF000000]
    zero = spark.createDataFrame([(1, [0.0, -1.0, 2.0])], "vec_id bigint, embedding array<float>")
    brow = zero.select(quantize.binarize_expr(F.col("embedding"), 3).alias("b")).first()
    # only dim 2 (> 0) sets its MSB-first bit: weight 2^(31-2)
    assert brow["b"] == [1 << 29]


def test_hamming_self_is_zero_and_symmetric(spark, emb):
    bt = quantize.binarize_table(emb)
    a = bt.alias("a").limit(5)
    joined = a.crossJoin(bt.alias("b").limit(5)).select(
        F.col("a.vec_id").alias("u"),
        F.col("b.vec_id").alias("v"),
        quantize.hamming_expr(F.col("a.b_vec"), F.col("b.b_vec")).alias("h"),
    )
    rows = {(r["u"], r["v"]): r["h"] for r in joined.collect()}
    for (u, v), h in rows.items():
        assert h == rows[(v, u)]
        if u == v:
            assert h == 0


def test_binary_rerank_recall_vs_exact(spark, emb):
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    bt = quantize.binarize_table(emb)
    got = [r["vec_id"] for r in quantize.binary_search_rerank(bt, emb, qv, k=10, rerank_k=40).collect()]
    mem = emb.select(
        F.col("vec_id").cast("string").alias("id"),
        F.lit("t").alias("text"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.lit(None).cast("string").alias("session"),
        "embedding",
        F.lit(None).cast("timestamp").alias("created_at"),
    )
    exact = [int(r["id"]) for r in memory_store.search(mem, qv, limit=10).collect()]
    assert got[0] == exact[0] == 0  # self-match always survives (hamming 0)
    overlap = len(set(got) & set(exact))
    # SimHash candidates at 4x over-fetch: the rerank output IS exact cosine
    # order over the survivors, so overlap measures candidate recall only
    assert overlap >= 6, f"binary-rerank top-10 overlap too low: {overlap}"


def test_binary_storage_32x_smaller_columns(spark, emb, tmp_path):
    full, packed = str(tmp_path / "full"), str(tmp_path / "packed")
    emb.write.parquet(full)
    quantize.binarize_table(emb).write.parquet(packed)
    import glob, os

    size = lambda p: sum(os.path.getsize(f) for f in glob.glob(f"{p}/*.parquet"))
    # 64 floats (256B) -> 2 bigints (16B) per row before encoding; parquet
    # encodings narrow the gap, but packed must stay well under half
    assert size(packed) < 0.5 * size(full), (size(packed), size(full))


def test_hamming_near_dup_pairs_banding_recall(spark):
    """Pairs within bands-1 bits MUST be found (pigeonhole); far pairs must
    not appear; the pair verifier reports the true Hamming distance."""
    rows = [
        (1, [0x0F0F0F0F, 0x12345678]),
        (2, [0x0F0F0F0F, 0x12345679]),   # 2 bits from #1 (…78 vs …79 -> 1? 0x78^0x79=1 bit)
        (3, [0x0F0F0F0E, 0x12345678]),   # 1 bit from #1
        (4, [0x70F0F0F0, 0x65432187]),   # far from everything
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, b_vec array<bigint>")
    got = {(r["u"], r["v"]): r["hamming"] for r in
           quantize.hamming_near_dup_pairs(df, max_bits=7, bands=8).collect()}
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(2, 3)] == 2
    assert not any(4 in p for p in got)


def test_binarized_neardup_catches_jittered_copies(spark, emb):
    from pyspark.sql import functions as F

    base = emb.select("vec_id", "embedding").filter(F.col("vec_id") < 50)
    jit = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: (x + F.lit(0.001)).cast("float")).alias("embedding"),
    )
    coded = quantize.binarize_table(base.unionByName(jit), dim=64)
    pairs = {(r["u"], r["v"]) for r in
             quantize.hamming_near_dup_pairs(coded, max_bits=7, bands=8).collect()}
    assert pairs == {(i, i + 1000) for i in range(50)}
