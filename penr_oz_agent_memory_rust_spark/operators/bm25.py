"""BM25 keyword retrieval + hybrid (keyword ⊕ vector) search.

The reference retrieves by embedding similarity only; production agent
memories pair that with lexical retrieval and fuse the rankings. Everything
here is pure relational algebra — an inverted index as a DataFrame, scoring
as a join + aggregation — so it scales like any other aggregation and is
oracle-expressible in SQL.

BM25(d, q) = Σ_{t∈q} idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 - b + b·|d|/avgdl))
idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (Robertson-Sparck Jones, Lucene form)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

K1 = 1.2
B = 0.75


def build_term_index(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Inverted index: one row per (term, doc) with tf, doc length, df, idf,
    and the corpus-average length. At scale this is written once (bucketed
    by term) and reused per query batch.
    Output: (term, doc_id, tf, dl, df, idf, avgdl, n_docs)."""
    tokens = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    )
    tf = tokens.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = tokens.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = docs.agg(F.count("*").alias("n_docs")).crossJoin(
        dl.agg(F.avg("dl").alias("avgdl"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    return (
        tf.join(dl, id_col)
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
    )


def bm25_search(
    index: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Score documents against the query terms (deduplicated), return top-k.
    The term filter prunes the index scan to the query's posting lists; the
    per-doc aggregation is one map-side-combinable groupBy."""
    terms = sorted(set(t.lower() for t in query_terms if t))
    hits = index.filter(F.col("term").isin(terms))
    contrib = (
        F.col("idf")
        * (F.col("tf") * (K1 + 1))
        / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        hits.withColumn("contrib", contrib)
        .groupBy(id_col)
        .agg(F.sum("contrib").alias("bm25"))
    )
    if round_to is not None:
        scored = scored.withColumn("bm25", F.round("bm25", round_to))
    from penr_oz_agent_memory_rust_spark.operators.topk import top_k

    return top_k(scored, "bm25", k, tiebreak=id_col)


def reciprocal_rank_fusion(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    k: int = 10,
    c: int = 60,
    depth: int = 1000,
) -> DataFrame:
    """Hybrid fusion: RRF(d) = Σ 1/(c + rank_i(d)) over both ranked lists.
    Inputs must already be ranked (any score column); ranks are assigned by
    row order of their score desc. Standard robust fusion for keyword ⊕
    vector retrieval.

    Each list is truncated to `depth` via TakeOrderedAndProject (bounded
    heaps) BEFORE ranking, so the single-partition row_number window sees at
    most `depth` rows regardless of input size — no global sort at scale."""
    from pyspark.sql import Window

    def with_rank(df):
        score_col = [col for col in df.columns if col != id_col][0]
        order = [F.col(score_col).desc(), F.col(id_col)]
        w = Window.partitionBy(F.lit(0)).orderBy(*order)
        return df.orderBy(*order).limit(depth).select(
            id_col, F.row_number().over(w).alias("rnk")
        )

    a, b = with_rank(ranked_a), with_rank(ranked_b)
    fused = (
        a.select(id_col, (1.0 / (c + F.col("rnk"))).alias("contrib"))
        .unionByName(b.select(id_col, (1.0 / (c + F.col("rnk"))).alias("contrib")))
        .groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 9).alias("rrf"))
    )
    from penr_oz_agent_memory_rust_spark.operators.topk import top_k

    return top_k(fused, "rrf", k, tiebreak=id_col)


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """★ Per-document top-k TF-IDF keywords (sklearn smooth-idf form):
    weight(t, d) = (tf/dl) · (ln((1+N)/(1+df)) + 1). The standard
    keyword-extraction / document-tagging primitive a training-data
    pipeline uses for topic routing and diversity-aware sampling.

    Reuses the BM25 inverted index (one explode + three hash-aggs); the
    top-k is a window PARTITIONED BY document — per-partition cardinality
    is one document's vocabulary, so there is no global sort and the
    plan scales with the corpus like any other per-key aggregation.
    Output: (id_col, term, tfidf, rnk), rnk 1..k per document.
    Ranking compares the ROUNDED weight (then term asc) so both engines
    of an oracle comparison break near-ties identically."""
    from pyspark.sql import Window

    index = build_term_index(docs, id_col, text_col)
    w = (F.col("tf") / F.col("dl")) * (
        F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    )
    scored = index.select(
        F.col(id_col), F.col("term"), F.round(w, round_to).alias("tfidf")
    )
    win = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return scored.withColumn("rnk", F.row_number().over(win)).filter(
        F.col("rnk") <= k
    )
