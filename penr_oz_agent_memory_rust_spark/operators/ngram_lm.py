"""Word-level n-gram language model with stupid backoff (★ north-star).

The CCNet/C4-style corpus-quality filter at the word level: train bigram +
unigram counts on a trusted reference corpus, score candidate documents by
their mean log-probability under the model, and filter/stratify on the
score. Complements the character-bigram perplexity proxy
(operators/corpus.py lm_quality_score) — the word model separates
in-domain from out-of-domain text, the char model catches encoding noise
and gibberish.

"Stupid backoff" (Brants et al. 2007, "Large Language Models in Machine
Translation") is the distributed-friendly choice: no discount mass
bookkeeping, just score = c(w1,w2)/c(w1) when the bigram was observed,
else 0.4 * unigram probability — exactly the scheme Google used for
trillion-token LMs because counts stay raw and shardable.

Scale shape: unlike the alphabet²-bounded char model, a word-bigram table
grows with the corpus (millions of rows at 100 TB), so the model is NEVER
collected to the driver — training is two hash aggregations with map-side
partials, `min_count` prunes the long tail (pruned bigrams simply back
off), and scoring is two equi-joins that AQE broadcasts when the model is
small and shuffle-joins when it is not. The N/V scalars ride along as a
broadcast 1-row frame, not a driver value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from penr_oz_agent_memory_rust_spark.functions import hashing

BACKOFF = 0.4


def _bigram_rows(docs: DataFrame, text_col: str, *keep: str) -> DataFrame:
    """(keep..., w1, w2) — one row per adjacent token pair. Stays inside
    whole-stage codegen (explode of an index sequence + array indexing;
    the transform(..., struct) form runs its lambda interpreted)."""
    return (
        docs.withColumn("__toks", hashing.word_tokens(F.col(text_col)))
        .filter(F.size("__toks") >= 2)
        .select(
            *keep,
            "__toks",
            F.explode(F.sequence(F.lit(1), F.size("__toks") - 1)).alias("__i"),
        )
        .select(
            *keep,
            F.expr("__toks[__i - 1]").alias("w1"),
            F.expr("__toks[__i]").alias("w2"),
        )
    )


def word_lm_train(
    train: DataFrame, text_col: str = "text", min_count: int = 1
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the model from a reference corpus. Returns
    (bigrams, unigrams, totals):

      bigrams : (w1, w2, c12, c1)  — c1 joined in at train time so the
                scoring join does not need a third probe; bigrams with
                c12 < min_count are pruned (they back off at score time)
      unigrams: (w, c)
      totals  : 1 row (n_tokens, v) for the backoff denominator

    Two hash aggregations (map-side partial) + one join of the pruned
    bigram table against the unigram table; nothing collects.
    """
    toks = hashing.cpu_rebalance(
        train.withColumn("__toks", hashing.word_tokens(F.col(text_col)))
    ).select(F.explode("__toks").alias("w"))
    unigrams = toks.groupBy("w").agg(F.count("*").alias("c")).persist()
    totals = unigrams.agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("v"),
    )
    bigrams = (
        _bigram_rows(hashing.cpu_rebalance(train), text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .filter(F.col("c12") >= min_count)
        .join(
            unigrams.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1"
        )
    )
    return bigrams, unigrams, totals


def word_lm_score(
    docs: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    totals: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    backoff: float = BACKOFF,
) -> DataFrame:
    """Score each doc: (id, n_bigrams, backoff_rate, lm_score).

    lm_score = mean over adjacent pairs of
        log2(c12 / c1)                          if (w1,w2) survived pruning
        log2(backoff * (c(w2)+1) / (N+V))       otherwise (add-one smoothed
                                                so unseen unigrams stay
                                                finite)
    Docs with < 2 tokens produce no row. Rounded to 6 dp for oracle
    portability; both joins are plain equi-joins AQE may broadcast.
    """
    pairs = _bigram_rows(hashing.cpu_rebalance(docs), text_col, id_col)
    u2 = unigrams.select(F.col("w").alias("w2"), F.col("c").alias("__c2"))
    scored = (
        pairs.join(bigrams, ["w1", "w2"], "left")
        .join(u2, "w2", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "__logp",
            F.when(
                F.col("c12").isNotNull(),
                F.log2(F.col("c12") / F.col("c1")),
            ).otherwise(
                F.log2(
                    F.lit(backoff)
                    * (F.coalesce(F.col("__c2"), F.lit(0)) + F.lit(1))
                    / (F.col("n_tokens") + F.col("v"))
                )
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg(F.col("c12").isNull().cast("double")), 6).alias(
            "backoff_rate"
        ),
        F.round(F.avg("__logp"), 6).alias("lm_score"),
    )
