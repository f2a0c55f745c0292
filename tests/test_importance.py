"""DSIR importance resampling (operators/importance.py, arXiv:2302.03169)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import importance

B = 64  # small bucket count keeps the dense spine cheap in tests


@pytest.fixture()
def corpora(spark):
    # target: English-looking function-word text; off-target: digits/noise
    target = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)],
        "doc_id bigint, text string",
    )
    raw = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),  # on-target
            (101, "the lazy dog sleeps near the quick fox"),  # close
            (102, "zzz qqq 999 777 xxx kkk vvv www"),  # off-target
            (103, "111 222 333 444 555 666 777 888"),  # off-target
        ],
        "doc_id bigint, text string",
    )
    return target, raw


def test_bucket_model_is_dense_normalized_distribution(spark, corpora):
    target, _ = corpora
    m = importance.train_bucket_model(target, n_buckets=B).toPandas()
    assert len(m) == B
    assert sorted(m["bucket"]) == list(range(B))
    total_p = sum(math.exp(x) for x in m["logp"])
    assert abs(total_p - 1.0) < 1e-9  # add-one smoothing still normalizes


def test_weights_rank_on_target_docs_above_noise(spark, corpora):
    target, raw = corpora
    tm = importance.train_bucket_model(target, n_buckets=B)
    rm = importance.train_bucket_model(raw, n_buckets=B)
    w = {
        r["doc_id"]: r["logratio"]
        for r in importance.importance_weights(raw, tm, rm, n_buckets=B).collect()
    }
    assert len(w) == 4
    # both on-target docs outrank both noise docs
    assert min(w[100], w[101]) > max(w[102], w[103])


def test_resample_is_deterministic_and_weight_biased(spark, corpora):
    target, raw = corpora
    tm = importance.train_bucket_model(target, n_buckets=B)
    rm = importance.train_bucket_model(raw, n_buckets=B)
    w = importance.importance_weights(raw, tm, rm, n_buckets=B)
    s1 = importance.importance_resample(w, k=2, seed=97).collect()
    s2 = importance.importance_resample(w, k=2, seed=97).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    # the log-ratio gap between on-target and noise docs here is far larger
    # than Gumbel noise (stddev ~1.28), so the sample must be the on-target docs
    assert {r["doc_id"] for r in s1} == {100, 101}


def test_resample_seed_changes_keys_not_contract(spark, corpora):
    target, raw = corpora
    tm = importance.train_bucket_model(target, n_buckets=B)
    rm = importance.train_bucket_model(raw, n_buckets=B)
    w = importance.importance_weights(raw, tm, rm, n_buckets=B)
    a = importance.importance_resample(w, k=4, seed=1).toPandas()
    b = importance.importance_resample(w, k=4, seed=2).toPandas()
    assert set(a["doc_id"]) == set(b["doc_id"]) == {100, 101, 102, 103}
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["gkey_a"] != merged["gkey_b"]).any()
    assert (merged["logratio_a"] == merged["logratio_b"]).all()


def test_dsir_select_end_to_end_subset_and_k(spark, corpora):
    target, raw = corpora
    out = importance.dsir_select(target, raw, k=3, n_buckets=B).toPandas()
    assert len(out) == 3
    assert set(out["doc_id"]).issubset({100, 101, 102, 103})
    assert list(out.columns) == ["doc_id", "logratio", "gkey"]


def test_empty_text_docs_carry_no_weight_row(spark, corpora):
    target, _ = corpora
    raw = spark.createDataFrame(
        [(1, "the quick fox"), (2, None)], "doc_id bigint, text string"
    )
    tm = importance.train_bucket_model(target, n_buckets=B)
    rm = importance.train_bucket_model(raw.filter(F.col("text").isNotNull()), n_buckets=B)
    w = importance.importance_weights(raw, tm, rm, n_buckets=B)
    assert [r["doc_id"] for r in w.collect()] == [1]
