"""Distributed Lloyd's: inertia monotonicity, bit-determinism across
repartitioning, expression-assignment parity with numpy, profile agg."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import kmeans
from penr_oz_agent_memory_rust_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def model(emb):
    return kmeans.kmeans_fit(emb, k=5, n_iters=6)


def test_inertia_non_increasing(model):
    C, hist = model
    assert C.shape == (5, 64) and len(hist) == 6
    for a, b in zip(hist, hist[1:]):
        assert b <= a + 1e-9, hist


def test_bit_deterministic_rerun(emb, model):
    C, hist = model
    C2, hist2 = kmeans.kmeans_fit(emb, k=5, n_iters=6)
    np.testing.assert_array_equal(C, C2)
    assert hist == hist2


def test_close_across_partitioning(emb, model):
    # per-batch float64 partials change with batch composition, so a
    # different split agrees to float noise, not bit-exactly
    C, _ = model
    C2, _ = kmeans.kmeans_fit(emb.repartition(7), k=5, n_iters=6)
    np.testing.assert_allclose(C, C2, rtol=0, atol=1e-4)


def test_assign_expr_matches_numpy(emb, model):
    C, _ = model
    got = {r["vec_id"]: r["cell"] for r in kmeans.assign_clusters(emb, C).collect()}
    X = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()}
    Cd = C.astype(np.float64)
    for vid, x in X.items():
        d2 = ((Cd - x[None, :]) ** 2).sum(axis=1)
        assert got[vid] == int(np.argmin(d2)), vid


def test_assignment_is_pure_expression(emb, model):
    C, _ = model
    plan = kmeans.assign_clusters(emb, C)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_cluster_profile_partitions_corpus(emb, model):
    C, _ = model
    rows = kmeans.cluster_profile(emb, C).collect()
    assert sum(r["size"] for r in rows) == emb.count()
    assert all(r["mean_sq_dist"] >= 0 for r in rows)
    assert len(rows) >= 2  # data actually spread across clusters


def test_k_larger_than_corpus(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(3)], "vec_id bigint, embedding array<float>"
    )
    C, hist = kmeans.kmeans_fit(df, k=8, n_iters=3)
    assert C.shape == (3, 2)  # clamped to corpus size
    assert hist[-1] <= 1e-12  # every point is its own centroid
