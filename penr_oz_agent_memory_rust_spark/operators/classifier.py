"""Model-based quality filtering over an embedding column — the
"classifier filter" stage of LLM data pipelines (a linear probe scores
every document; the corpus keeps the high-scoring tail).

Two trainers, one scorer:

  * class_centroid_weights — the closed-form probe: w = mean(x | y=1) −
    mean(x | y=0) per dimension. One distributed aggregation (posexplode
    → per-dim avg, d rows to the driver — bounded by the DIMENSION, not
    the corpus), SQL-expressible, so scoring with these weights is
    oracle-checked against DuckDB.
  * logreg_fit — full-batch logistic regression by gradient descent
    using the kmeans_fit partials recipe: per iteration ONE Arrow pass
    emits per-batch (gradient-sum, loss-sum, count) partials — a single
    (d+2)-float row per batch — and the driver folds them in sorted
    order (bit-deterministic per partitioning, no shuffle ever).

  * score_expr — sigmoid(w·x + b) as a pure native expression
    (zip_with/aggregate, codegen): scoring a 100 TB corpus is a
    map-only scan, no Python, no shuffle.

No counterpart in the reference (no model ops at all); north-star ★
alongside dedup/ANN as first-class pipeline components.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def class_centroid_weights(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_dp: int | None = 6,
) -> np.ndarray:
    """w[i] = avg(x_i | label=1) − avg(x_i | label=0), rounded to
    round_dp so cross-engine float parity never hinges on aggregation
    order ulps. posexplode keeps the per-dim aggregation distributed;
    only d rows reach the driver."""
    ex = df.select(
        F.col(label_col).alias("__y"), F.posexplode(F.col(vec_col)).alias("__i", "__x")
    )
    agg = (
        ex.groupBy("__i")
        .agg(
            F.avg(F.when(F.col("__y") == 1, F.col("__x").cast("double"))).alias("m1"),
            F.avg(F.when(F.col("__y") == 0, F.col("__x").cast("double"))).alias("m0"),
        )
        .orderBy("__i")
        .collect()
    )
    w = np.asarray([(r["m1"] or 0.0) - (r["m0"] or 0.0) for r in agg], dtype=np.float64)
    if round_dp is not None:
        w = np.round(w, round_dp)
    return w


def score_expr(
    vec_col: Column,
    weights: np.ndarray,
    bias: float = 0.0,
    round_dp: int | None = 6,
    round_dot_dp: int | None = None,
) -> Column:
    """sigmoid(w·x + b) as a native expression — left-to-right float64
    accumulation over the zipped arrays, exactly mirrorable in SQL.
    round_dot_dp: round the dot product BEFORE the sigmoid (oracle
    queries set it so both engines feed exp identical inputs and parity
    can't hinge on accumulation-order ulps)."""
    lit_w = F.array(*[F.lit(float(x)) for x in weights])
    dot = F.aggregate(
        F.zip_with(vec_col.cast("array<double>"), lit_w, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dot = dot + F.lit(float(bias))
    if round_dot_dp is not None:
        dot = F.round(dot, round_dot_dp)
    s = F.lit(1.0) / (F.lit(1.0) + F.exp(-dot))
    return F.round(s, round_dp) if round_dp is not None else s


def logreg_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    n_iters: int = 20,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> tuple[np.ndarray, float, list[float]]:
    """Full-batch logistic regression: returns (weights (d,), bias, loss
    history — mean log-loss per iteration). Each iteration is one Arrow
    pass emitting a single partial row per batch: [grad_w (d), grad_b,
    loss_sum, n]. The driver fold is sorted (scheduling-independent) and
    the update is plain GD with l2 — deterministic zero init, fixed
    iterations."""
    data = df.select(F.col(vec_col).alias("__v"), F.col(label_col).cast("double").alias("__y"))
    cached = data.persist()
    sc = df.sparkSession.sparkContext
    n_total = cached.count()
    # right-size the per-iteration task count: every GD iteration launches
    # one task per partition, and with tiny per-task matrices the launch
    # overhead dominates (measured: 15 iters x 32 near-empty tasks cost
    # more than the matmuls). ~5k rows per task floors the overhead while
    # leaving real data parallel; at scale rows/5k >= cluster cores and
    # this is a no-op.
    cur = cached.rdd.getNumPartitions()
    target = max(1, min(cur, n_total // 5_000 + 1))
    if target < cur:
        resized = cached.coalesce(target).persist()
        resized.count()
        cached.unpersist()
        cached = resized
    first = cached.first()
    d = len(first["__v"])
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    history: list[float] = []
    try:
        for _ in range(n_iters):
            bc = sc.broadcast((w, b))

            def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                wv, bv = bc.value
                for pdf in batches:
                    if pdf.empty:
                        continue
                    X = np.asarray(list(pdf["__v"]), dtype=np.float64)
                    y = pdf["__y"].to_numpy(dtype=np.float64)
                    z = X @ wv + bv
                    p = 1.0 / (1.0 + np.exp(-z))
                    r = p - y
                    gw = X.T @ r
                    gb = float(r.sum())
                    # clipped log-loss (stable at p -> 0/1)
                    eps = 1e-12
                    ls = float(
                        -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()
                    )
                    yield pd.DataFrame(
                        {
                            "g": [gw.tolist()],
                            "gb": [gb],
                            "loss": [ls],
                            "n": [len(y)],
                        }
                    )

            rows = cached.mapInPandas(
                partials, schema="g array<double>, gb double, loss double, n bigint"
            ).collect()
            rows.sort(key=lambda r: (r["n"], r["loss"], r["gb"], r["g"]))
            gw = np.zeros(d, dtype=np.float64)
            gb = 0.0
            loss = 0.0
            for r in rows:
                gw += np.asarray(r["g"], dtype=np.float64)
                gb += r["gb"]
                loss += r["loss"]
            history.append(loss / max(n_total, 1))
            w -= lr * (gw / n_total + l2 * w)
            b -= lr * (gb / n_total)
            bc.destroy()
    finally:
        cached.unpersist()
    return w, b, history


def classifier_filter(
    df: DataFrame,
    weights: np.ndarray,
    bias: float = 0.0,
    vec_col: str = "embedding",
    threshold: float = 0.5,
    score_col: str = "clf_score",
) -> DataFrame:
    """Keep rows the probe scores above threshold — a map-only scan."""
    scored = df.withColumn(score_col, score_expr(F.col(vec_col), weights, bias))
    return scored.filter(F.col(score_col) >= threshold)
