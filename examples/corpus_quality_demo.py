"""Corpus-quality & curation demo — the round-5 quality surface in one
runnable script, the fourth leg next to agent_demo.py (serving),
training_pipeline_demo.py (batch pipeline), and eval_monitoring_demo.py
(evaluation):

    documents ─ markup strip (crawl extraction) ─ per-source winsorized
              quality ─ word-LM stupid-backoff scoring ─ vocab coverage
              (OOV) ─ temperature-scaled mixture plan ─ content-defined
              chunking ─ fuzzy linkage on the part catalog
    embeddings ─ exact kNN graph ─ triangles / clustering coefficients
    events ─ seasonal-baseline anomaly scan

Run: python examples/corpus_quality_demo.py          (~1 min, sf0.001)
Every step is the same oracle-checked operator the driver gates; this
script only chains them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.functions import similarity
from penr_oz_agent_memory_rust_spark.operators import corpus, knn, text_ops
from penr_oz_agent_memory_rust_spark.operators.drift import seasonal_anomalies
from penr_oz_agent_memory_rust_spark.operators.graph_stats import triangle_stats
from penr_oz_agent_memory_rust_spark.operators.linkage import best_match, fuzzy_pairs
from penr_oz_agent_memory_rust_spark.operators.ngram_lm import (
    word_lm_score,
    word_lm_train,
)
from penr_oz_agent_memory_rust_spark.session import get_spark
from penr_oz_agent_memory_rust_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="corpus-quality-demo")
    docs = load_table(spark, SF_DIR, "documents")

    # [1] crawl extraction: strip a synthetic HTML wrapper byte-exactly
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><body><script>x()</script><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    extracted = wrapped.select(
        "doc_id", text_ops.strip_markup(F.col("html")).alias("text")
    )
    print(f"[1] markup-stripped docs: {extracted.count()}")

    # [2] per-source winsorized + standardized quality
    scored = docs.select(
        "doc_id", "source", text_ops.quality_score_expr(F.col("text")).alias("quality")
    )
    wz = corpus.winsorize_by_group(scored, "source")
    print("[2] winsorized quality sample:")
    wz.orderBy("doc_id").limit(3).show(truncate=False)

    # [3] word-LM stupid-backoff scoring (train on half, score the rest)
    half = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    model = word_lm_train(docs.filter(F.col("doc_id") < half), min_count=2)
    lm = word_lm_score(docs.filter(F.col("doc_id") >= half), *model)
    print("[3] word-LM scores (top 3 by lm_score):")
    lm.orderBy(F.col("lm_score").desc()).limit(3).show()

    # [4] vocab coverage of the same split
    cov = corpus.vocab_coverage(
        docs.filter(F.col("doc_id") < half),
        docs.filter(F.col("doc_id") >= half),
        vocab_size=500,
    )
    print("[4] worst-covered docs (highest OOV):")
    cov.orderBy(F.col("oov_rate").desc()).limit(3).show()

    # [5] temperature-scaled mixture plan
    mix = corpus.temperature_mixture_weights(docs, alpha=0.5, n_total=100)
    print("[5] temperature mixture plan (alpha=0.5):")
    mix.orderBy("lang").show()

    # [6] content-defined chunking
    chunks = text_ops.cdc_chunk_documents(docs, gram=8, modulus=64)
    stats = chunks.agg(
        F.count("*").alias("chunks"), F.round(F.avg("chunk_len"), 1).alias("avg_len")
    ).collect()[0]
    print(f"[6] CDC chunks: {stats.chunks} (avg len {stats.avg_len} chars)")

    # [7] fuzzy linkage over the part catalog
    parts = load_table(spark, SF_DIR, "part").select("p_partkey", "p_name")
    pairs = fuzzy_pairs(parts, "p_partkey", "p_name", max_distance=2)
    bm = best_match(pairs)
    print(f"[7] fuzzy part pairs: {pairs.count()}, best-match rows: {bm.count()}")

    # [8] kNN graph -> triangle structure
    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 200)
    q = F.broadcast(
        emb.select(F.col("vec_id").alias("src"), F.col("embedding").alias("qv"))
    )
    scored_pairs = (
        emb.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("ev"))
        .crossJoin(q)
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            similarity.cosine_f64(F.col("ev"), F.col("qv")).alias("score"),
        )
        .filter(F.col("score").isNotNull())
    )
    edges = knn.top_k_per_group(scored_pairs, ["src"], "score", 5, tiebreak="dst")
    tri = triangle_stats(edges.select("src", "dst"))
    print("[8] kNN-graph structure (most clustered nodes):")
    tri.orderBy(F.col("clustering").desc(), "id").limit(3).show()

    # [9] seasonal anomaly scan over events
    ev = load_table(spark, SF_DIR, "events")
    cut = F.lit("2024-01-16").cast("timestamp_ntz")
    anom = seasonal_anomalies(
        ev.filter(F.col("ts") < cut), ev.filter(F.col("ts") >= cut),
        threshold=3.0, min_baseline=10,
    )
    print(f"[9] seasonal anomalies flagged: {anom.count()}")

    print("\ncorpus-quality demo complete")
    spark.stop()


if __name__ == "__main__":
    main()
