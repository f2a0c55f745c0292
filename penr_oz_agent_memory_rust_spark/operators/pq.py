"""Product quantization (PQ) for embedding compression + ADC search
(north-star ★ ANN operator, SURVEY §2.7).

Jégou et al., "Product Quantization for Nearest Neighbor Search" (TPAMI
2011) — the memory lever that makes billion-vector search feasible: a
d-dim float32 vector (4d bytes) becomes m uint8 codes (m bytes), a
4d/m× compression (32× at d=64, m=8), and search runs against the codes
via an asymmetric distance computation (ADC) lookup table without ever
decoding the corpus.

Spark mapping:
  train   — per-subspace k-means on a CAPPED driver-side sample (the
            knn.train_ivf_centroids recipe; FAISS trains on samples too).
            Codebooks are m × ksub × dsub floats — a few KB, broadcast.
  encode  — one mapInPandas pass: per Arrow batch, vectorized argmin over
            each subspace's codebook (BLAS distance matrices, no per-row
            Python). Output column: array<smallint> codes.
  search  — the query builds an m × ksub lookup table driver-side (tiny);
            a pandas UDF sums LUT gathers per code row — O(m) per vector
            with NO decode; exact top-k' re-rank against the original
            vectors restores exact ordering for the final k (the standard
            ADC + re-rank pipeline).

Approximate by construction (quantization error), so these operators are
recall-pinned in tests/ and PLANS.md rather than DuckDB-hashed — same
policy as lsh_ann / ivf_ann.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from penr_oz_agent_memory_rust_spark.operators.topk import top_k


def _rng(seed: int) -> np.random.Generator:
    return np.random.Generator(
        np.random.PCG64(int.from_bytes(hashlib.md5(f"pq{seed}".encode()).digest()[:8], "little"))
    )


def train_pq_codebooks(
    vectors: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 256,
    n_iters: int = 10,
    seed: int = 42,
    max_sample_rows: int = 50_000,
) -> np.ndarray:
    """Train m sub-codebooks of ksub centroids each on a bounded sample.

    Returns (m, ksub, dsub) float32. Deterministic: seeded init, fixed
    iterations, k-means per subspace with empty-cluster re-seeding from
    the farthest points. The collect is capped at max_sample_rows no
    matter the corpus size (sample-then-limit, the train_ivf_centroids
    guard)."""
    df = vectors.select(vec_col)
    n = df.count()
    frac = min(1.0, max_sample_rows / max(n, 1))
    if frac < 1.0:
        df = df.sample(fraction=frac, seed=seed)
    X = np.asarray([r[0] for r in df.limit(max_sample_rows).collect()], dtype=np.float32)
    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    k = min(ksub, len(X))
    rng = _rng(seed)
    books = np.empty((m, k, dsub), dtype=np.float32)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[rng.choice(len(S), size=k, replace=False)].copy()
        for _ in range(n_iters):
            # (n, k) squared distances via the expansion trick
            d2 = (
                (S * S).sum(axis=1, keepdims=True)
                - 2.0 * (S @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
                else:  # re-seed dead centroid at the worst-served point
                    C[c] = S[np.argmax(d2.min(axis=1))]
        books[j] = C
    return books


def encode_pq(
    vectors: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-encode every vector: (id, codes array<smallint>). One Arrow pass,
    argmin per subspace against the broadcast codebooks — the corpus never
    moves, no shuffle."""
    m, k, dsub = codebooks.shape
    bc = vectors.sparkSession.sparkContext.broadcast(codebooks)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray(list(pdf[vec_col]), dtype=np.float32)
            codes = np.empty((len(X), m), dtype=np.int16)
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                C = books[j]
                d2 = (
                    (S * S).sum(axis=1, keepdims=True)
                    - 2.0 * (S @ C.T)
                    + (C * C).sum(axis=1)[None, :]
                )
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    out_schema = f"{id_col} bigint, codes array<smallint>"
    return vectors.select(id_col, vec_col).mapInPandas(enc, schema=out_schema)


def decode_pq_expr(codebooks: np.ndarray):
    """Reconstruction as a driver-side numpy helper for tests (the search
    path never decodes — that is the point of ADC)."""

    def decode(codes: np.ndarray) -> np.ndarray:
        m, _, dsub = codebooks.shape
        out = np.empty((len(codes), m * dsub), dtype=np.float32)
        for j in range(m):
            out[:, j * dsub : (j + 1) * dsub] = codebooks[j][codes[:, j]]
        return out

    return decode


def pq_search(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    metric: str = "l2",
) -> DataFrame:
    """ADC top-k over the codes: per code row, score = Σ_j LUT[j, code_j].

    The LUT (m × ksub distances/dots between the query's subvectors and
    every codebook entry) is computed once driver-side and broadcast —
    scanning N codes costs N·m int gathers, no decode, no shuffle; top-k
    is TakeOrderedAndProject. metric: "l2" (ascending) or "dot"
    (descending). Output: (id, adc) — adc is the approximate distance/
    similarity; exact re-ranking joins the original vectors for the
    candidates only (pq_search_rerank)."""
    m, ksub, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float32)
    if q.shape[0] != m * dsub:
        raise ValueError(f"query dim {q.shape[0]} != codebook dim {m * dsub}")
    lut = np.empty((m, ksub), dtype=np.float32)
    for j in range(m):
        qs = q[j * dsub : (j + 1) * dsub]
        C = codebooks[j]
        if metric == "dot":
            lut[j] = C @ qs
        else:
            diff = C - qs[None, :]
            lut[j] = (diff * diff).sum(axis=1)
    bc = codes_df.sparkSession.sparkContext.broadcast(lut)

    @F.pandas_udf("float")
    def adc(codes: pd.Series) -> pd.Series:
        L = bc.value
        M = np.asarray(list(codes), dtype=np.int64)  # (batch, m)
        vals = L[np.arange(m)[None, :], M].sum(axis=1)
        return pd.Series(vals)

    scored = codes_df.withColumn("adc", adc(F.col("codes")))
    if metric == "dot":
        return top_k(scored, "adc", k, tiebreak=id_col).select(id_col, "adc")
    asc = scored.orderBy(F.col("adc").asc(), F.col(id_col).asc()).limit(k)
    return asc.select(id_col, "adc")


def pq_search_rerank(
    codes_df: DataFrame,
    vectors: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    kprime: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC candidates (k' ≥ k) exact-re-ranked by f64 cosine against the
    ORIGINAL vectors — the standard two-stage PQ pipeline: the 32×-smaller
    code table absorbs the full scan; only k' rows touch float vectors.
    Output: (id, score) top-k by exact cosine."""
    from penr_oz_agent_memory_rust_spark.functions import similarity

    cand = pq_search(codes_df, codebooks, query_vec, k=kprime, id_col=id_col, metric="l2")
    qlit = similarity.query_vec_lit(query_vec, "f64")
    exact = (
        cand.select(id_col)
        .join(vectors.select(id_col, vec_col), id_col)
        .withColumn(
            "score", F.round(similarity.cosine_f64(F.col(vec_col), qlit), 6)
        )
        .filter(F.col("score").isNotNull())
    )
    return top_k(exact, "score", k, tiebreak=id_col).select(id_col, "score")
