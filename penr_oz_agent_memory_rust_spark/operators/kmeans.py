"""Distributed Lloyd's k-means over an embedding column.

The IVF/PQ trainers (knn.train_ivf_centroids, pq.train_pq_codebooks)
k-means a CAPPED driver-side sample — the right recipe for coarse
quantizers, but a 100 TB corpus whose distribution a 50k-row sample
can't represent needs the real thing. This is the classic
map-side-combine Lloyd's:

  per iteration, ONE Arrow pass over the (cached) corpus emits per-batch
  PARTIALS — (cell, count, float64 sum-vector, inertia) — so at most
  k rows per Arrow batch cross the wire; the driver combines k × batches
  partials (bounded by the partition count, never the corpus) and updates
  k × d centroids. No shuffle at all: the "reduce" is the driver fold of
  a tiny partial set, the corpus never moves.

Determinism: seeded init from a LEXSORTED capped sample (collect order
follows partitioning; sorting removes it), fixed iteration count, and
the driver fold SORTS the collected partials before accumulating — so a
given input partitioning yields BIT-identical centroids no matter how
tasks were scheduled. Across different partitionings the per-batch
float64 partial sums legitimately differ in the last ulps (batch
composition changes), so cross-partitioning runs agree to ~1e-6, not
bit-exactly — pinned both ways in tests/test_kmeans.py.

(pyspark.ml.clustering.KMeans exists, but it wants VectorUDT columns,
seeds differently across Spark versions, and hides the iteration loop;
20 lines of partials keep the arrays native, the runs bit-reproducible,
and the inertia history inspectable.)

No counterpart in the reference (brute-force scoring only,
src/memory.rs:154-198); north-star ★ — the trainer feeding
ivf_index.build_ivf_index / ivfpq.build_ivfpq_index at full-corpus
fidelity, plus cluster-profile analytics for corpus curation.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def _rng(seed: int) -> np.random.Generator:
    return np.random.Generator(
        np.random.PCG64(int.from_bytes(hashlib.md5(f"km{seed}".encode()).digest()[:8], "little"))
    )


def kmeans_fit(
    corpus: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    n_iters: int = 10,
    seed: int = 42,
    max_init_sample_rows: int = 50_000,
) -> tuple[np.ndarray, list[float]]:
    """Fit k l2 centroids; returns (centroids (k, d) float32, inertia
    history — one mean-squared-distance per iteration, non-increasing up
    to float noise). Only the seeded INIT sample and the per-iteration
    partials (≤ k rows per Arrow batch) ever reach the driver."""
    df = corpus.select(vec_col)
    n = df.count()
    frac = min(1.0, max_init_sample_rows / max(n, 1))
    init_df = df.sample(fraction=frac, seed=seed) if frac < 1.0 else df
    S = np.asarray(
        [r[0] for r in init_df.limit(max_init_sample_rows).collect()], dtype=np.float32
    )
    # collect order follows partition order — lexsort the sample so the
    # seeded init picks the same rows no matter how the input was split
    S = S[np.lexsort(S.T[::-1])]
    rng = _rng(seed)
    k = min(k, len(S))
    C = S[rng.choice(len(S), size=k, replace=False)].astype(np.float64).copy()
    d = C.shape[1]
    sc = corpus.sparkSession.sparkContext
    cached = df.persist()
    history: list[float] = []
    try:
        for _ in range(n_iters):
            bc = sc.broadcast(C.astype(np.float32))

            def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                Cb = bc.value.astype(np.float64)
                for pdf in batches:
                    if pdf.empty:
                        continue
                    X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
                    d2 = (
                        (X * X).sum(axis=1, keepdims=True)
                        - 2.0 * (X @ Cb.T)
                        + (Cb * Cb).sum(axis=1)[None, :]
                    )
                    a = np.argmin(d2, axis=1)
                    md = np.maximum(d2[np.arange(len(X)), a], 0.0)
                    cells, counts, sums, inert = [], [], [], []
                    for c in np.unique(a):
                        mask = a == c
                        cells.append(int(c))
                        counts.append(int(mask.sum()))
                        sums.append(X[mask].sum(axis=0).tolist())
                        inert.append(float(md[mask].sum()))
                    yield pd.DataFrame(
                        {"cell": cells, "n": counts, "s": sums, "inertia": inert}
                    )

            rows = cached.mapInPandas(
                partials, schema="cell int, n bigint, s array<double>, inertia double"
            ).collect()
            # sorted fold: float64 accumulation order independent of task order
            rows.sort(key=lambda r: (r["cell"], r["n"], r["inertia"], r["s"]))
            counts = np.zeros(k, dtype=np.int64)
            sums = np.zeros((k, d), dtype=np.float64)
            total_inertia = 0.0
            for r in rows:
                counts[r["cell"]] += r["n"]
                sums[r["cell"]] += np.asarray(r["s"], dtype=np.float64)
                total_inertia += r["inertia"]
            history.append(total_inertia / max(int(counts.sum()), 1))
            for c in range(k):
                if counts[c] > 0:
                    C[c] = sums[c] / counts[c]
                # dead centroid: keep it where it is (deterministic; the
                # seeded init makes true deaths rare at corpus scale)
            bc.destroy()
    finally:
        cached.unpersist()
    return C.astype(np.float32), history


def kmeans_assign_expr(
    vec_col: Column, centroids: np.ndarray, round_dp: int | None = None
) -> Column:
    """Nearest-centroid id by l2, as a pure native expression (codegen,
    no Python): argmin over k literal centroid arrays with index
    tie-break — the assignment half of the model, usable as a partition
    column exactly like knn.ivf_assign_expr's cosine variant.

    round_dp: round each d2 before the argmin — used by the oracle query
    so cross-engine parity never hinges on the last ulps of two engines'
    float summation when centroids are near-equidistant (ties then break
    by index on both sides)."""
    structs = []
    for j, c in enumerate(centroids):
        lit_c = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.aggregate(
            F.zip_with(vec_col.cast("array<double>"), lit_c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if round_dp is not None:
            d2 = F.round(d2, round_dp)
        structs.append(F.struct(d2.alias("d"), F.lit(j).alias("j")))
    return F.array_min(F.array(*structs)).getField("j")


def assign_clusters(
    corpus: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = None,
) -> DataFrame:
    """(id, cell) for every row — JVM-side, zero shuffle."""
    return corpus.select(
        id_col, kmeans_assign_expr(F.col(vec_col), centroids, round_dp).alias("cell")
    )


def cluster_profile(
    corpus: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster curation stats: size + mean squared l2 distance to the
    centroid (rounded 6dp) — the corpus-composition view a
    cluster-balanced sampler feeds on. One hash aggregate."""
    structs = []
    for j, c in enumerate(centroids):
        lit_c = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), lit_c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        structs.append(F.struct(d2.alias("d"), F.lit(j).alias("j")))
    arr = F.array_min(F.array(*structs))
    assigned = corpus.select(
        arr.getField("j").alias("cell"), arr.getField("d").alias("d2")
    )
    return (
        assigned.groupBy("cell")
        .agg(
            F.count("*").alias("size"),
            F.round(F.avg("d2"), 6).alias("mean_sq_dist"),
        )
        .orderBy("cell")
    )
