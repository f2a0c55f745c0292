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
