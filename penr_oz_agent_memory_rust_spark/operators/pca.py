"""Distributed PCA via gramian accumulation, plus Mahalanobis outlier
scoring (★ north-star pipeline operators).

Training-data use: (a) learned dimensionality reduction ahead of the ANN /
clustering family — unlike the data-oblivious JL projection
(operators/projection.py), PCA picks the directions that actually carry the
corpus's variance, so the same d' keeps more neighborhood structure; (b)
embedding-space outlier detection (Mahalanobis distance) to surface
corrupt / out-of-distribution vectors before they pollute an index.

Scale shape — the classic one-pass second-moment pattern (Spark MLlib's
RowMatrix.computeGramianMatrix, re-expressed DataFrame-native):

  1. One Arrow pass per partition accumulates (count, column-sum, X^T X)
     in a d×d float64 buffer — BLAS matmul per batch, O(d^2) state.
  2. Partials are emitted as (i, j, v) rows — d^2 + d + 1 rows per
     partition — and reduced by one hash aggregation (map-side combine).
  3. The d×d eigenproblem is solved driver-side: the collect is BOUNDED at
     d^2 + d + 1 rows of metadata (d = 4096 → 16M doubles worst case;
     d = 64 here → 4 KB), never corpus-sized.
  4. The fitted model (mean, components) travels back inside a map-only
     Arrow projection — no shuffle, no further driver participation.

Determinism: eigenvector signs are fixed (largest-|component| entry made
positive), eigenvalues sorted descending with index tiebreak, so a fit is
reproducible across partitionings up to f64 summation noise (~1e-13 —
far below the 6dp rounding used by the oracle-checked gramian gate).
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


class PCAModel(NamedTuple):
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (r, d): rows are eigenvectors, eigenvalue desc
    explained_variance: np.ndarray  # (r,) eigenvalues of the covariance
    n_rows: int


def _stats_rows(df: DataFrame, vec_col: str) -> DataFrame:
    """Second-moment partials as (i, j, v) rows, reduced by one hash agg:
    (0,0) -> row count, (i,0) -> column sum_i (1-indexed), (i,j) -> gramian
    Σ v[i]·v[j]. Output is d^2 + d + 1 rows regardless of input size."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        G = None
        s = None
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            n += X.shape[0]
            if G is None:
                G = X.T @ X
                s = X.sum(axis=0)
            else:
                G += X.T @ X
                s += X.sum(axis=0)
        if n:
            d = G.shape[0]
            idx = np.arange(1, d + 1)
            ii, jj = np.meshgrid(idx, idx, indexing="ij")
            yield pd.DataFrame(
                {
                    "i": np.concatenate(([0], idx, ii.ravel())),
                    "j": np.concatenate(([0], np.zeros(d, dtype=np.int64), jj.ravel())),
                    "v": np.concatenate(([float(n)], s, G.ravel())),
                }
            )

    return (
        df.select(vec_col)
        .mapInPandas(part, "i long, j long, v double")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )


def gramian_rows(
    df: DataFrame, vec_col: str = "embedding", round_to: int | None = 6
) -> DataFrame:
    """The d×d gramian X^T X as (i, j, g) rows (1-indexed, full matrix).
    One scan, one d^2-bounded aggregation — the oracle-checkable face of
    the PCA stats pass."""
    out = (
        _stats_rows(df, vec_col)
        .filter((F.col("i") > 0) & (F.col("j") > 0))
        .select("i", "j", F.col("v").alias("g"))
    )
    if round_to is not None:
        out = out.select("i", "j", F.round("g", round_to).alias("g"))
    return out


def fit_pca(
    df: DataFrame, n_components: int | None = None, vec_col: str = "embedding"
) -> PCAModel:
    """Fit PCA from one distributed stats pass + a driver-side d×d eigh.

    The only collect is the reduced stats frame (d^2 + d + 1 rows — model
    metadata, not data). Covariance uses the unbiased (n-1) denominator."""
    rows = _stats_rows(df, vec_col).collect()
    n = 0
    d = max(r["i"] for r in rows)
    s = np.zeros(d)
    G = np.zeros((d, d))
    for r in rows:
        i, j, v = r["i"], r["j"], r["v"]
        if i == 0:
            n = int(v)
        elif j == 0:
            s[i - 1] = v
        else:
            G[i - 1, j - 1] = v
    if n < 2:
        raise ValueError("fit_pca needs at least 2 rows")
    mu = s / n
    C = (G - n * np.outer(mu, mu)) / (n - 1)
    evals, evecs = np.linalg.eigh(C)  # ascending
    order = np.argsort(-evals, kind="stable")
    r = d if n_components is None else min(n_components, d)
    comps = evecs[:, order[:r]].T.copy()  # (r, d)
    for k in range(r):
        m = np.argmax(np.abs(comps[k]))
        if comps[k, m] < 0:
            comps[k] = -comps[k]
    return PCAModel(
        mean=mu,
        components=comps,
        explained_variance=np.maximum(evals[order[:r]], 0.0),
        n_rows=n,
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pvec",
) -> DataFrame:
    """Append `out_col` = centered projection onto the model's components
    (float32, matching the ANN family's storage). Map-only Arrow pass; the
    (r×d) component matrix ships inside the task closure — model metadata,
    a few hundred KB at realistic d."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} array<float>"
    mu = model.mean.astype(np.float64)
    W = model.components.astype(np.float64)

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            Y = ((X - mu) @ W.T).astype(np.float32)
            pdf = pdf.copy()
            pdf[out_col] = list(Y)
            yield pdf

    return df.mapInPandas(proj, schema=out_schema)


def mahalanobis_scores(
    df: DataFrame,
    model: PCAModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1e-9,
    round_to: int | None = 6,
) -> DataFrame:
    """(id, maha): squared Mahalanobis distance to the fitted distribution,
    computed in the eigenbasis — Σ_k ((x-μ)·v_k)^2 / (λ_k + eps). With a
    full-rank model this is exact; with a truncated model it scores the
    retained subspace. Map-only Arrow pass, same closure-shipping shape as
    pca_project."""
    mu = model.mean.astype(np.float64)
    W = model.components.astype(np.float64)
    inv_l = 1.0 / (model.explained_variance.astype(np.float64) + eps)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            Z = (X - mu) @ W.T
            m = (Z * Z * inv_l).sum(axis=1)
            if round_to is not None:
                m = np.round(m, round_to)
            yield pd.DataFrame({id_col: pdf[id_col].values, "maha": m})

    id_type = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[id_col]
    return df.select(id_col, vec_col).mapInPandas(score, f"{id_col} {id_type}, maha double")


def diag_mahalanobis(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """(id, maha): diagonal-covariance Mahalanobis — Σ_i (x_i - μ_i)^2 /
    (σ_i^2 + eps) with per-dimension population moments. Entirely built-in
    expressions (no Python anywhere), hence SQL-oracle-checkable: per-dim
    stats come from a posexplode + d-bounded hash agg, are re-assembled
    into two d-length arrays in a 1-row frame, broadcast-crossed back, and
    the score folds with F.aggregate over zip_with. Moments are rounded to
    `round_to` BEFORE use so an external oracle computing the same rounded
    moments agrees bit-for-bit."""
    dims = df.select(
        id_col, F.posexplode(vec_col).alias("__i", "__x")
    ).select(id_col, "__i", F.col("__x").cast("double").alias("__x"))
    stats = (
        dims.groupBy("__i")
        .agg(
            F.round(F.avg("__x"), round_to).alias("__mu"),
            F.round(F.avg(F.col("__x") * F.col("__x")), round_to).alias("__m2"),
        )
        .select(
            "__i",
            "__mu",
            (F.col("__m2") - F.col("__mu") * F.col("__mu")).alias("__var"),
        )
    )
    packed = stats.agg(
        F.array_sort(F.collect_list(F.struct("__i", "__mu", "__var"))).alias("__s")
    ).select(
        F.transform("__s", lambda s: s["__mu"]).alias("__mus"),
        F.transform("__s", lambda s: s["__var"]).alias("__vars"),
    )
    scored = df.select(id_col, vec_col).crossJoin(F.broadcast(packed))
    term = F.zip_with(
        F.zip_with(
            F.col(vec_col),
            F.col("__mus"),
            lambda x, m: (x.cast("double") - m) * (x.cast("double") - m),
        ),
        F.col("__vars"),
        lambda d2, v: d2 / (v + F.lit(eps)),
    )
    return scored.select(
        id_col,
        F.round(
            F.aggregate(term, F.lit(0.0), lambda acc, t: acc + t), round_to
        ).alias("maha"),
    )
