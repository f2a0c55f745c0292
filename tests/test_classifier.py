"""Classifier filter: centroid probe separates synthetic classes, logreg
loss decreases + beats the prior, scoring stays a pure expression,
determinism per partitioning."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import classifier
from penr_oz_agent_memory_rust_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def sep(spark):
    """Linearly separable toy set: class 1 shifted +1 on dims 0-1."""
    rng = np.random.default_rng(7)
    rows = []
    for i in range(400):
        y = i % 2
        x = rng.normal(0, 0.3, 8)
        if y:
            x[0] += 1.0
            x[1] += 1.0
        rows.append((i, [float(v) for v in x], y))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")


def test_centroid_weights_point_at_shift(sep):
    w = classifier.class_centroid_weights(sep)
    assert len(w) == 8
    assert w[0] > 0.5 and w[1] > 0.5
    assert all(abs(x) < 0.3 for x in w[2:])


def test_centroid_scores_separate(sep):
    w = classifier.class_centroid_weights(sep)
    scored = sep.withColumn("s", classifier.score_expr(F.col("embedding"), w, bias=-float(w @ w) / 2))
    rows = scored.select("label", "s").collect()
    m1 = np.mean([r["s"] for r in rows if r["label"] == 1])
    m0 = np.mean([r["s"] for r in rows if r["label"] == 0])
    assert m1 - m0 > 0.3, (m0, m1)


def test_score_is_pure_expression(sep):
    w = classifier.class_centroid_weights(sep)
    df = sep.withColumn("s", classifier.score_expr(F.col("embedding"), w))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_logreg_loss_decreases_and_classifies(sep):
    w, b, hist = classifier.logreg_fit(sep, n_iters=30, lr=1.0)
    assert hist[-1] < hist[0] * 0.6, hist[::10]
    pred = sep.withColumn("s", classifier.score_expr(F.col("embedding"), w, b))
    rows = pred.select("label", "s").collect()
    acc = np.mean([(r["s"] >= 0.5) == (r["label"] == 1) for r in rows])
    assert acc >= 0.95, acc


def test_logreg_deterministic_rerun(sep):
    a = classifier.logreg_fit(sep, n_iters=5)
    b = classifier.logreg_fit(sep, n_iters=5)
    np.testing.assert_array_equal(a[0], b[0])
    assert a[1] == b[1] and a[2] == b[2]


def test_filter_keeps_high_scores(sep):
    w, b, _ = classifier.logreg_fit(sep, n_iters=30, lr=1.0)
    kept = classifier.classifier_filter(sep, w, b, threshold=0.5)
    rows = kept.collect()
    assert 0 < len(rows) < 400
    pos = np.mean([r["label"] for r in rows])
    assert pos > 0.8, pos


def test_on_real_embeddings_label_column(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    w = classifier.class_centroid_weights(emb)
    assert len(w) == 64 and np.isfinite(w).all()
    scored = emb.withColumn("s", classifier.score_expr(F.col("embedding"), w))
    assert scored.filter(F.col("s").isNull()).count() == 0
