"""DSIR-style importance resampling (north-star ★ operator, SURVEY §2.7).

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
distribution resembles a small TARGET corpus. The published recipe maps
1:1 onto declarative Spark:

  1. features   — unigrams + bigrams hashed into B buckets (hashed n-gram
                  features; B bounds the model regardless of vocabulary).
  2. models     — bag-of-n-grams bucket distributions for target and raw,
                  add-one smoothed over all B buckets. Each model is B rows
                  (a few KB) — broadcastable no matter how big the corpora.
  3. weights    — per raw doc, log w = Σ_grams [log p_target(b) − log p_raw(b)];
                  one explode + one broadcast join + one map-side-combinable
                  per-doc aggregate. The raw corpus never shuffles its text.
  4. resample   — Gumbel top-k: key = log w + Gumbel(0,1). With a
                  DETERMINISTIC per-doc uniform (seeded md5 of the id) this
                  equals sampling-without-replacement ∝ w (Efraimidis-
                  Spirakis via the Gumbel trick) yet is exactly reproducible
                  and oracle-checkable in SQL.

All hashing is portable md5 (functions/hashing.py) so every stage has an
exact DuckDB equivalent; log/exp differences between libm implementations
sit ~1 ulp and are absorbed by the 6-dp rounding the gates compare at.

100 TB shape: the only full-corpus stages are one explode→hash→count per
model (map-side partial agg into B buckets) and the per-doc weight agg;
the model join is a broadcast of B rows; selection is a bounded-heap
TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, functions as F

from penr_oz_agent_memory_rust_spark.functions import hashing
from penr_oz_agent_memory_rust_spark.operators.topk import top_k

# 2^60: md5_long values are 60-bit non-negative, so (h+1)/(2^60+1) ∈ (0, 1)
_MD5_SPAN = 1 << 60


def hashed_gram_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-doc hashed n-gram bag (unigrams + bigrams) as PRE-COUNTED
    (id, bucket, c) rows — c is the doc's occurrence count for that
    bucket, so downstream aggregates weight by c instead of seeing one
    row per occurrence. Semantically the same bag-of-n-grams; the wire
    carries at most min(grams, n_buckets) rows per doc instead of every
    occurrence, and the gram hashing runs as one Arrow pass (C-speed
    md5) instead of interpreted per-element Catalyst lambdas — the
    dsir_select warm A/B at sf0.1 is in the commit.

    Bigram convention matches word_shingles(n=2): a one-token doc
    contributes its single token as the degenerate "bigram" (the same
    expression the oracle uses)."""
    import hashlib as _hl
    from collections import Counter

    from pyspark.sql import types as T

    docs = hashing.cpu_rebalance(docs)

    @F.pandas_udf(
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("b", T.IntegerType()),
                    T.StructField("c", T.LongType()),
                ]
            )
        )
    )
    def _bucket_counts(texts: pd.Series) -> pd.Series:
        def bc(t):
            if t is None:
                return None
            toks = t.lower().split(" ")
            m = max(1, len(toks) - 1)
            grams = toks + [" ".join(toks[i : i + 2]) for i in range(m)]
            # identical to pmod(md5_long(g), n_buckets): first 15 hex
            # chars of md5 are the portable 60-bit value
            cnt = Counter(
                int(_hl.md5(g.encode()).hexdigest()[:15], 16) % n_buckets
                for g in grams
            )
            return list(cnt.items())

        return texts.map(bc)

    return docs.select(
        F.col(id_col), F.explode(_bucket_counts(F.col(text_col))).alias("__s")
    ).select(F.col(id_col), F.col("__s.b").alias("bucket"), F.col("__s.c").alias("c"))


def train_bucket_model(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Add-one-smoothed bucket log-probabilities over the corpus:
    (bucket, logp) with exactly n_buckets rows — ln((c_b + 1) / (T + B)),
    T = total gram occurrences. The dense spine (spark.range) gives absent
    buckets their smoothed floor, so the scoring join never needs an outer
    join or a null path. The 1-row total is crossJoined in (the deliberate
    broadcast-1-row pattern) to keep the plan fully declarative."""
    # `grams`: callers that also need the per-doc gram rows (dsir_select
    # scores the SAME raw corpus it models) pass one shared frame so the
    # corpus-wide Arrow hashing pass runs once, not once per consumer (r10)
    counts = (
        (grams if grams is not None else hashed_gram_rows(docs, id_col, text_col, n_buckets))
        .groupBy("bucket")
        .agg(F.sum("c").alias("c"))
    )
    spine = docs.sparkSession.range(n_buckets).select(F.col("id").alias("bucket"))
    dense = spine.join(counts, "bucket", "left").select(
        "bucket", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    total = dense.agg(F.sum("c").alias("__t"))
    return dense.crossJoin(F.broadcast(total)).select(
        "bucket",
        F.log(
            (F.col("c") + F.lit(1)).cast("double")
            / (F.col("__t") + F.lit(n_buckets)).cast("double")
        ).alias("logp"),
    )


def importance_weights(
    raw_docs: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Per-doc DSIR log importance weight: (id, logratio).
    logratio = Σ over the doc's gram occurrences of
    logp_target(bucket) − logp_raw(bucket). Docs whose text produces no
    grams (empty after tokenization) get no row — they carry no evidence
    either way and resampling skips them."""
    model = F.broadcast(
        target_model.select("bucket", F.col("logp").alias("__lt")).join(
            raw_model.select("bucket", F.col("logp").alias("__lr")), "bucket"
        )
    )
    if grams is None:
        grams = hashed_gram_rows(raw_docs, id_col, text_col, n_buckets)
    return (
        grams.join(model, "bucket")
        .groupBy(id_col)
        # c * (lt - lr) instead of one addend per occurrence: same sum up
        # to FP associativity (~1 ulp, absorbed by the 6-dp gate rounding,
        # and fewer addends per doc is the numerically tighter form)
        .agg(F.sum(F.col("c") * (F.col("__lt") - F.col("__lr"))).alias("logratio"))
    )


def gumbel_key(weight: Column, id_col: Column, seed: int) -> Column:
    """Deterministic Gumbel perturbation: u = (md5_60bit(seed|id)+1)/(2^60+1)
    ∈ (0,1), key = weight − ln(−ln u). Reproducible across engines (md5) and
    runs; equals Gumbel-top-k sampling ∝ exp(weight)."""
    u = (
        (hashing.seeded_md5_long(id_col.cast("string"), seed) + F.lit(1)).cast("double")
        / F.lit(float(_MD5_SPAN + 1))
    )
    return weight - F.log(-F.log(u))


def importance_resample(
    weighted: DataFrame,
    k: int,
    seed: int = 97,
    id_col: str = "doc_id",
    weight_col: str = "logratio",
) -> DataFrame:
    """Gumbel top-k selection over (id, logratio): the k sampled docs,
    (id, logratio, gkey) with both values rounded to 6 dp for cross-engine
    hash comparison. TakeOrderedAndProject — no global sort, no window."""
    keyed = weighted.withColumn(
        "gkey", gumbel_key(F.col(weight_col), F.col(id_col), seed)
    )
    return top_k(keyed, "gkey", k, tiebreak=id_col).select(
        id_col,
        F.round(F.col(weight_col), 6).alias(weight_col),
        F.round(F.col("gkey"), 6).alias("gkey"),
    )


def dsir_select(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    seed: int = 97,
) -> DataFrame:
    """The end-to-end DSIR pipeline: train both bucket models, weight every
    raw doc, Gumbel-top-k resample. Output: (id, logratio, gkey) × k.

    The raw corpus's hashed-gram rows feed BOTH its bucket model and the
    per-doc weights; one eagerly-materialized frame serves both (r10) —
    one corpus hashing pass instead of two, identical values."""
    tm = train_bucket_model(target_docs, id_col, text_col, n_buckets)
    # r11 (recovery semantics): the raw-gram frame is LARGER than the
    # corpus (one row per (doc, distinct bucket)), so it is materialized
    # with persist(DISK_ONLY) — recomputable from lineage on executor
    # loss — rather than localCheckpoint, whose executor-local blocks are
    # unrecoverable and whose write is corpus-sized. Both consumers (the
    # raw bucket model and the per-doc weights) still share ONE corpus
    # hashing pass: the first action populates the cache, the second
    # reads it.
    grams_raw = hashed_gram_rows(
        raw_docs, id_col, text_col, n_buckets
    ).persist(StorageLevel.DISK_ONLY)
    rm = train_bucket_model(raw_docs, id_col, text_col, n_buckets, grams=grams_raw)
    w = importance_weights(
        raw_docs, tm, rm, id_col, text_col, n_buckets, grams=grams_raw
    )
    return importance_resample(w, k, seed, id_col)
