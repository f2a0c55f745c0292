"""Seeded Gaussian random projection (Johnson–Lindenstrauss): map-only
dimensionality reduction for embedding columns.

At 100 TB the embedding column dominates every byte count downstream —
LSH signatures, PQ codebooks, k-means distances all cost O(d). A JL
projection to d' « d preserves pairwise distances within (1±ε) w.h.p.
(ε ≈ sqrt(8 ln N / d')), so running the CANDIDATE-GENERATION stages
(lsh_knn_join, minhash-style bucketing, ivfpq coarse assignment) on
projected vectors and re-ranking exactly on the originals keeps recall
while cutting the hot column 8-24×.

Execution: the (d × d') projection matrix is generated PER EXECUTOR from
the seed (numpy PCG64 — a few MB at most, cheaper to regenerate than to
broadcast), and one Arrow pass does the matmul per batch. No shuffle, no
driver participation, deterministic for a given (seed, dims).

No counterpart in the reference; north-star ★ preprocessing for the ANN
family.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _proj_matrix(in_dim: int, out_dim: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(
        np.random.PCG64(
            int.from_bytes(hashlib.md5(f"jl{seed}|{in_dim}|{out_dim}".encode()).digest()[:8], "little")
        )
    )
    # N(0, 1/d') entries: E[|Px|^2] = |x|^2, the distance-preserving scale
    return rng.normal(0.0, 1.0 / np.sqrt(out_dim), size=(in_dim, out_dim)).astype(np.float32)


def project_embeddings_expr(
    df: DataFrame,
    in_dim: int,
    out_dim: int,
    vec_col: str = "embedding",
    out_col: str = "proj",
    seed: int = 42,
    round_dp: int | None = None,
) -> DataFrame:
    """The JL projection as a PURE NATIVE EXPRESSION: each output
    component is a left-to-right float64 fold of x·M[:,j] over literal
    matrix columns — whole-stage codegen, no Python workers, and (with
    round_dp set) bit-mirrorable in SQL, unlike the Arrow/BLAS twin
    project_embeddings whose f32 matmul accumulation order is numpy's.
    The matrix is the SAME seeded Gaussian as the Arrow path (in f32
    literal values), so both paths project into the same space. Plan size
    grows with in_dim × out_dim literals — right for candidate-generation
    dims (≤ a few thousand products); use the Arrow path beyond that."""
    P = _proj_matrix(in_dim, out_dim, seed)
    comps = []
    for j in range(out_dim):
        mj = F.array(*[F.lit(float(P[i, j])) for i in range(in_dim)])
        comp = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), mj, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if round_dp is not None:
            comp = F.round(comp, round_dp)
        comps.append(comp)
    return df.withColumn(out_col, F.array(*comps))


def project_rows_arrow_exact(
    df: DataFrame,
    id_col: str,
    in_dim: int,
    out_dim: int,
    vec_col: str = "embedding",
    out_col: str = "proj",
    seed: int = 42,
    id_type: str = "bigint",
) -> DataFrame:
    """(id, proj) with values BIT-IDENTICAL to project_embeddings_expr at
    round_dp=None, computed in one vectorized Arrow pass (r10): the expr
    form's 16×64-literal tree costs interpreted per-element evaluation
    AND a plan large enough that driver analysis dominated the jl gate
    (~170 KB formatted plan). The fold is reproduced exactly — f64
    products, left-to-right adds from 0.0 — by looping over INPUT dims
    while vectorizing across rows and output dims. Rounding is left to
    the caller as a JVM expression (Spark round is HALF_UP; numpy's is
    banker's). Rows whose vector is NULL or whose length != in_dim yield
    [NULL]*out_dim, matching zip_with's pad-with-null fold."""
    P64 = _proj_matrix(in_dim, out_dim, seed).astype(np.float64)

    def project(batches):
        import pyarrow as pa

        for batch in batches:
            tbl = batch.to_pydict()
            ids = tbl[id_col]
            vecs = tbl[vec_col]
            good_idx = [i for i, v in enumerate(vecs) if v is not None and len(v) == in_dim]
            out = [[None] * out_dim] * len(vecs)
            if good_idx:
                V = np.asarray([vecs[i] for i in good_idx], dtype=np.float64)
                acc = np.zeros((V.shape[0], out_dim), dtype=np.float64)
                for i in range(in_dim):
                    acc = acc + V[:, i : i + 1] * P64[i, :]
                for row, i in enumerate(good_idx):
                    out[i] = acc[row].tolist()
            yield pa.RecordBatch.from_pydict(
                {
                    id_col: pa.array(ids),
                    out_col: pa.array(out, type=pa.list_(pa.float64())),
                }
            )

    return df.select(id_col, vec_col).mapInArrow(
        project, f"{id_col} {id_type}, {out_col} array<double>"
    )


def project_embeddings(
    df: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    out_col: str = "proj",
    seed: int = 42,
) -> DataFrame:
    """Append `out_col` = the out_dim-dimensional Gaussian projection of
    vec_col. One mapInPandas pass, matrix regenerated executor-side from
    the seed (never broadcast, never collected)."""
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{fields}, {out_col} array<float>"

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = None
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray(list(pdf[vec_col]), dtype=np.float32)
            if P is None:
                P = _proj_matrix(X.shape[1], out_dim, seed)
            Y = X @ P
            pdf = pdf.copy()
            pdf[out_col] = list(Y)
            yield pdf

    return df.mapInPandas(proj, schema=out_schema)
