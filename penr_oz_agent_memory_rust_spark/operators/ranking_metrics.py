"""Retrieval-evaluation metrics (★ north-star pipeline operator).

Training-data / search-quality use: given a *run* (ranked retrieval results
per query) and *qrels* (graded relevance judgments), compute the standard IR
metrics — precision@k, recall@k, reciprocal rank, DCG/nDCG@k — per query and
macro-averaged. This is how a user of the reference engine (an agent-memory
vector search service) would measure retrieval quality after changing an
embedding model, an ANN index, or a fusion weight; the reference itself has
no evaluation surface, so this is net-new capability per SURVEY.md §2.7 ★.

Scale shape: one hash join of run×qrels on the composite (query, doc) key,
then per-query hash aggregations with map-side partial combine. The ideal
DCG is derived from a per-query *grade histogram* (counts per relevance
grade), not from sorting the judged documents: positions are assigned to
grades best-first, so IDCG@k is a closed-form sum over at most
|distinct grades| rows per query — no corpus-sized window, no per-query
sort, O(#grades) work per query regardless of how many documents are
judged. All arithmetic is f64 with a deterministic intra-query term order,
so the whole operator is oracle-checkable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dcg_term(rel, pos):
    """Graded DCG contribution of one hit: (2^rel - 1) / log2(pos + 1)."""
    return (F.pow(F.lit(2.0), rel) - F.lit(1.0)) / F.log2(pos + F.lit(1.0))


def ideal_dcg(
    qrels: DataFrame,
    k: int,
    query_col: str = "qid",
    rel_col: str = "rel",
) -> DataFrame:
    """(query, n_rel, idcg) per query from the grade histogram.

    Positions 1..k are filled with judged documents in descending grade
    order; a grade with `cnt` documents starting at prefix offset `off`
    occupies positions off+1 .. off+cnt, clipped to k. Its IDCG share is
    (2^g - 1) * sum_{p in that clipped range} 1/log2(p+1), evaluated with
    F.aggregate over a bounded sequence (≤ k terms). The only window runs
    over the per-query grade histogram — ≤ |grade alphabet| rows per query.
    """
    gh = (
        qrels.filter(F.col(rel_col) > 0)
        .groupBy(query_col, rel_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    w = (
        Window.partitionBy(query_col)
        .orderBy(F.col(rel_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gh = gh.withColumn("__off", F.sum("__cnt").over(w) - F.col("__cnt"))
    lo = F.col("__off") + F.lit(1)
    hi = F.least(F.col("__off") + F.col("__cnt"), F.lit(k))
    share = F.when(
        F.col("__off") < k,
        (F.pow(F.lit(2.0), F.col(rel_col)) - F.lit(1.0))
        * F.aggregate(
            F.sequence(lo, hi),
            F.lit(0.0),
            lambda acc, p: acc + F.lit(1.0) / F.log2(p.cast("double") + F.lit(1.0)),
        ),
    ).otherwise(F.lit(0.0))
    return gh.groupBy(query_col).agg(
        F.sum("__cnt").alias("n_rel"),
        F.sum(share).alias("__idcg"),
    )


def retrieval_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "qid",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    round_to: int = 6,
) -> DataFrame:
    """Per-query IR metrics at cutoff k.

    run:   (query, doc, rank) with rank starting at 1 within each query.
    qrels: (query, doc, rel) graded relevance; rel > 0 means relevant.

    Output, one row per judged query (queries with no rank<=k hit get
    zeros): (query, n_rel, n_hits, precision_at_k, recall_at_k, rr,
    dcg_at_k, ndcg_at_k), floats rounded to `round_to`.

    Queries present only in the run (nothing judged relevant) are excluded
    — their recall/nDCG are undefined, matching trec_eval behavior.
    """
    rel_pos = qrels.filter(F.col(rel_col) > 0)
    totals = ideal_dcg(rel_pos, k, query_col=query_col, rel_col=rel_col)
    hits = (
        run.filter(F.col(rank_col) <= k)
        .join(rel_pos, on=[query_col, doc_col], how="inner")
        .groupBy(query_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.sum(_dcg_term(F.col(rel_col), F.col(rank_col))).alias("__dcg"),
            F.max(F.lit(1.0) / F.col(rank_col)).alias("__rr"),
        )
    )
    out = totals.join(hits, on=query_col, how="left")
    dcg = F.coalesce(F.col("__dcg"), F.lit(0.0))
    return out.select(
        query_col,
        "n_rel",
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k)), round_to).alias(
            "precision_at_k"
        ),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_rel").cast("double"),
            round_to,
        ).alias("recall_at_k"),
        F.round(F.coalesce(F.col("__rr"), F.lit(0.0)), round_to).alias("rr"),
        F.round(dcg, round_to).alias("dcg_at_k"),
        F.round(
            F.when(F.col("__idcg") > 0, dcg / F.col("__idcg")).otherwise(F.lit(0.0)),
            round_to,
        ).alias("ndcg_at_k"),
    )


def macro_metrics(
    per_query: DataFrame,
    query_col: str = "qid",
    round_to: int = 6,
) -> DataFrame:
    """One-row macro average over the per-query metrics table: mean of each
    metric across judged queries (the trec_eval "all" row)."""
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("precision_at_k"), round_to).alias("macro_p_at_k"),
        F.round(F.avg("recall_at_k"), round_to).alias("macro_recall_at_k"),
        F.round(F.avg("rr"), round_to).alias("mrr"),
        F.round(F.avg("ndcg_at_k"), round_to).alias("macro_ndcg_at_k"),
    )
