"""Cosine kernel contract — ports the reference's scalar tests
(reference src/memory.rs:262-290): identical -> 1.0, orthogonal -> 0.0,
zero vector -> NULL, dim mismatch -> NULL; 1e-6 tolerance, f32 math."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.functions import similarity

TOL = 1e-6


def _eval(spark, a, b, fn):
    df = spark.createDataFrame(
        [(a, b)], "a array<float>, b array<float>"
    ).select(fn(F.col("a"), F.col("b")).alias("s"))
    return df.first()["s"]


def test_cosine_identical(spark):
    assert abs(_eval(spark, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0], similarity.cosine_f32) - 1.0) < TOL


def test_cosine_orthogonal(spark):
    assert abs(_eval(spark, [1.0, 0.0], [0.0, 1.0], similarity.cosine_f32)) < TOL


def test_cosine_opposite(spark):
    assert abs(_eval(spark, [1.0, 0.0], [-1.0, 0.0], similarity.cosine_f32) + 1.0) < TOL


def test_cosine_zero_vector_is_null(spark):
    # reference src/memory.rs:150-161: zero magnitude -> None
    assert _eval(spark, [0.0, 0.0], [1.0, 0.0], similarity.cosine_f32) is None
    assert _eval(spark, [1.0, 0.0], [0.0, 0.0], similarity.cosine_f32) is None


def test_cosine_dim_mismatch_is_null(spark):
    assert _eval(spark, [1.0, 0.0, 0.0], [1.0, 0.0], similarity.cosine_f32) is None


def test_dot_and_euclid(spark):
    assert abs(_eval(spark, [1.0, 2.0], [3.0, 4.0], similarity.dot_f32) - 11.0) < TOL
    assert abs(_eval(spark, [0.0, 0.0], [3.0, 4.0], similarity.euclidean_f32) - 5.0) < TOL


def test_euclid_dim_mismatch_is_null(spark):
    assert _eval(spark, [1.0], [1.0, 2.0], similarity.euclidean_f32) is None


def test_f64_matches_f32_within_tol(spark):
    v1, v2 = [0.9, 0.1, 0.0], [1.0, 0.0, 0.0]
    s32 = _eval(spark, v1, v2, similarity.cosine_f32)
    s64 = _eval(spark, v1, v2, similarity.cosine_f64)
    expected = 0.9 / math.sqrt(0.81 + 0.01)
    assert abs(s32 - expected) < 1e-5
    assert abs(s64 - expected) < 1e-9


def test_score_expr_dispatch(spark):
    with pytest.raises(ValueError):
        similarity.score_expr("manhattan", F.col("a"), F.col("b"))
