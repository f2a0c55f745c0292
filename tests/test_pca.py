from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import pca
from penr_oz_agent_memory_rust_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").persist()


@pytest.fixture(scope="module")
def X(emb):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    return np.asarray([r["embedding"] for r in rows], dtype=np.float64)


def test_gramian_matches_numpy(emb, X):
    got = {(r["i"], r["j"]): r["g"] for r in pca.gramian_rows(emb, round_to=None).collect()}
    G = X.T @ X
    d = X.shape[1]
    assert len(got) == d * d
    for (i, j), v in list(got.items())[::97]:
        assert v == pytest.approx(G[i - 1, j - 1], rel=1e-12)


def test_fit_matches_numpy_eigh(emb, X):
    model = pca.fit_pca(emb, n_components=8)
    C = np.cov(X, rowvar=False)
    evals, evecs = np.linalg.eigh(C)
    order = np.argsort(-evals)
    assert model.n_rows == X.shape[0]
    assert model.explained_variance == pytest.approx(evals[order[:8]], rel=1e-9)
    for k in range(8):
        v = evecs[:, order[k]]
        m = np.argmax(np.abs(v))
        if v[m] < 0:
            v = -v
        assert model.components[k] == pytest.approx(v, abs=1e-9)


def test_fit_partitioning_invariant(emb):
    m1 = pca.fit_pca(emb.repartition(1), n_components=4)
    m7 = pca.fit_pca(emb.repartition(7), n_components=4)
    assert m1.explained_variance == pytest.approx(m7.explained_variance, rel=1e-9)
    assert m1.components == pytest.approx(m7.components, abs=1e-9)


def test_project_centers_and_projects(emb, X):
    model = pca.fit_pca(emb, n_components=4)
    got = {
        r["vec_id"]: np.asarray(r["pvec"], dtype=np.float64)
        for r in pca.pca_project(emb, model).select("vec_id", "pvec").collect()
    }
    want = (X - model.mean) @ model.components.T
    for k, idx in [(min(got), 0), (max(got), len(X) - 1)]:
        assert got[k] == pytest.approx(want[idx], abs=1e-4)  # f32 storage


def test_project_variance_ordering(emb, X):
    """Projected variance per component must be descending (PCA's defining
    property) and ≈ the eigenvalues."""
    model = pca.fit_pca(emb, n_components=4)
    Y = (X - model.mean) @ model.components.T
    var = Y.var(axis=0, ddof=1)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(3))
    assert var == pytest.approx(model.explained_variance, rel=1e-9)


def test_mahalanobis_full_rank_exact(emb, X):
    model = pca.fit_pca(emb, n_components=None)
    got = {
        r["vec_id"]: r["maha"]
        for r in pca.mahalanobis_scores(emb, model, round_to=None).collect()
    }
    C = np.cov(X, rowvar=False) + 1e-9 * np.eye(X.shape[1])
    Ci = np.linalg.inv(C)
    D = X - X.mean(axis=0)
    want = np.einsum("ij,jk,ik->i", D, Ci, D)
    vals = np.asarray([got[k] for k in sorted(got)])
    assert vals == pytest.approx(want, rel=1e-4)


def test_diag_mahalanobis_matches_numpy(emb, X):
    got = {r["vec_id"]: r["maha"] for r in pca.diag_mahalanobis(emb).collect()}
    mu = np.round(X.mean(axis=0), 6)
    m2 = np.round((X * X).mean(axis=0), 6)
    var = m2 - mu * mu
    want = (((X - mu) ** 2) / (var + 1e-6)).sum(axis=1)
    vals = np.asarray([got[k] for k in sorted(got)])
    assert vals == pytest.approx(want, rel=1e-6, abs=1e-5)


def test_diag_mahalanobis_plan_has_no_python(emb):
    plan = pca.diag_mahalanobis(emb)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
