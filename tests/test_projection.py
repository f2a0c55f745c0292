"""JL random projection: determinism, shape, average distance
preservation, and schema passthrough."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import projection
from penr_oz_agent_memory_rust_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_shape_and_schema_passthrough(emb):
    out = projection.project_embeddings(emb, out_dim=16)
    assert out.columns == emb.columns + ["proj"]
    row = out.first()
    assert len(row["proj"]) == 16 and len(row["embedding"]) == 64


def test_deterministic(emb):
    a = {r["vec_id"]: list(r["proj"]) for r in projection.project_embeddings(emb, 16).collect()}
    b = {
        r["vec_id"]: list(r["proj"])
        for r in projection.project_embeddings(emb.repartition(5), 16).collect()
    }
    assert a == b


def test_seed_changes_output(emb):
    a = projection.project_embeddings(emb, 16, seed=1).first()["proj"]
    b = projection.project_embeddings(emb, 16, seed=2).first()["proj"]
    assert list(a) != list(b)


def test_distances_preserved_on_average(emb):
    out = projection.project_embeddings(emb.limit(200), out_dim=32).collect()
    X = np.asarray([r["embedding"] for r in out], dtype=np.float64)
    Y = np.asarray([r["proj"] for r in out], dtype=np.float64)
    rng = np.random.default_rng(3)
    ratios = []
    for _ in range(300):
        i, j = rng.choice(len(X), 2, replace=False)
        dx = np.linalg.norm(X[i] - X[j])
        dy = np.linalg.norm(Y[i] - Y[j])
        if dx > 0:
            ratios.append(dy / dx)
    m = float(np.mean(ratios))
    # E[ratio] = 1; with d'=32 individual pairs swing ±40% but the mean
    # over 300 pairs concentrates
    assert 0.9 < m < 1.1, m
    assert float(np.std(ratios)) < 0.3
