"""Evaluation & monitoring demo — the round-4 quality/observability surface
in one runnable script, the third leg next to agent_demo.py (serving) and
training_pipeline_demo.py (batch pipeline):

    embeddings ─ fit PCA (one stats pass) ─ explained variance
               ─ Mahalanobis outlier scan
               ─ retrieval evaluation (P/R/RR/nDCG@10 + macro) on the
                 cosine run vs label-match qrels
               ─ PCA-16 vs JL-16 candidate recall head-to-head
               ─ STREAMING drift monitor (baseline from the first half,
                 second half arrives shifted)
    documents  ─ per-source Jensen–Shannon divergence
               ─ label propagation from a 10% seed set over the kNN graph
               ─ k-core dense-community peel on the cosine threshold graph
    events     ─ hourly resample → fused gap-fill + interpolation
               ─ rolling median/std baselines → spike flags
    stream     ─ count-min partials folded per micro-batch; heavy hitters
                 answered from the live summed sketch

Run: python examples/eval_monitoring_demo.py          (~1 min, sf0.001)
Every step is the same oracle-checked operator the driver gates; this
script only chains them.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from penr_oz_agent_memory_rust_spark.functions import similarity
from penr_oz_agent_memory_rust_spark.operators import corpus, knn, pca, projection, ranking_metrics
from penr_oz_agent_memory_rust_spark.operators.label_prop import label_propagation
from penr_oz_agent_memory_rust_spark.session import get_spark
from penr_oz_agent_memory_rust_spark.sources.tables import load_table
from penr_oz_agent_memory_rust_spark.streaming.ingest import run_embedding_drift_once

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="poz-eval-monitoring-demo")
    emb = load_table(spark, SF_DIR, "embeddings").cache()
    docs = load_table(spark, SF_DIR, "documents")
    n = emb.count()
    print(f"[1] corpus: {n} vectors, {docs.count()} docs from {SF_DIR}")

    # -- PCA fit: one distributed stats pass, driver-side 64x64 eigh
    model = pca.fit_pca(emb, n_components=16)
    ev = model.explained_variance
    total_var = float(ev.sum())
    print(
        f"[2] PCA-16 fit on {model.n_rows} rows; top-4 explained variance "
        f"{[round(float(v), 4) for v in ev[:4]]}"
    )

    # -- outlier scan: full-rank Mahalanobis, top 5
    full = pca.fit_pca(emb, n_components=None)
    outl = pca.mahalanobis_scores(emb, full).orderBy(F.col("maha").desc()).limit(5)
    print("[3] top-5 Mahalanobis outliers:", [(r["vec_id"], round(r["maha"], 1)) for r in outl.collect()])

    # -- retrieval evaluation: cosine top-10 run vs label-match qrels
    qside = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"), F.col("label").alias("ql")
    )
    run11 = knn.expr_knn_join(
        qside.select("qid", "qv"), emb.select("vec_id", F.col("embedding").alias("vec")),
        k=11, query_id="qid", query_vec="qv", corpus_id="vec_id", corpus_vec="vec", round_to=6,
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id"))
    run = (
        run11.filter(F.col("vec_id") != F.col("qid"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("qid", F.col("vec_id").alias("doc_id"), "rank")
    )
    qrels = (
        emb.select(F.col("vec_id").alias("doc_id"), "label")
        .crossJoin(F.broadcast(qside.select("qid", "ql")))
        .filter(F.col("doc_id") != F.col("qid"))
        .select("qid", "doc_id", (F.col("label") == F.col("ql")).cast("int").alias("rel"))
    )
    per_q = ranking_metrics.retrieval_metrics(run, qrels, k=10)
    macro = ranking_metrics.macro_metrics(per_q).collect()[0]
    print(
        f"[4] retrieval eval over {macro['n_queries']} queries: "
        f"MRR {macro['mrr']}, macro nDCG@10 {macro['macro_ndcg_at_k']}, "
        f"macro recall@10 {macro['macro_recall_at_k']}"
    )

    # -- learned vs oblivious projection, candidate recall head-to-head
    truth = {}
    for r in run.filter(F.col("rank") <= 5).collect():
        truth.setdefault(r["qid"], set()).add(r["doc_id"])

    def recall_of(proj_df, col):
        pq = proj_df.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("qid"), F.col(col).alias("qv")
        )
        pc = proj_df.select(F.col("vec_id").alias("cid"), F.col(col).alias("cvec"))
        cand = knn.expr_knn_join(
            pq, pc, k=10, precision="f32",
            query_id="qid", query_vec="qv", corpus_id="cid", corpus_vec="cvec",
        )
        hits = sum(1 for r in cand.collect() if r["cid"] in truth.get(r["qid"], ()))
        return round(hits / (len(truth) * 5), 3)

    pca_rec = recall_of(pca.pca_project(emb.select("vec_id", "embedding"), model), "pvec")
    jl_rec = recall_of(projection.project_embeddings(emb.select("vec_id", "embedding"), 16), "proj")
    print(f"[5] candidate recall@5 in 16 dims: PCA {pca_rec} vs JL {jl_rec}")

    # -- streaming drift: baseline from the first half; second half shifted
    half = n // 2
    baseline = (
        emb.filter(F.col("vec_id") < half)
        .select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("mu"))
    )
    shifted = emb.select(
        F.timestamp_seconds(F.lit(1767225600) + F.col("vec_id")).alias("ts"),
        F.when(
            F.col("vec_id") >= half,
            F.transform("embedding", lambda x: x + F.lit(0.25)),
        ).otherwise(F.col("embedding")).alias("embedding"),
    )
    stream_dir = tempfile.mkdtemp(prefix="poz_drift_demo_")
    shifted.write.mode("overwrite").parquet(stream_dir)
    drift = run_embedding_drift_once(
        spark, stream_dir, baseline, window_secs=max(60, (half // 4) * 4),
        name="__demo_drift",
    )
    rows = sorted(drift.collect(), key=lambda r: r["ws"])
    print("[6] windowed drift (streamed):", [(r["ws"] - 1767225600, r["drift"]) for r in rows])
    assert rows[-1]["drift"] > rows[0]["drift"], "shifted window must score higher"

    # -- per-source corpus divergence
    div = corpus.source_divergence(docs).orderBy(F.col("js_bits").desc()).limit(3)
    print("[7] most-divergent sources:", [(r["source"], r["js_bits"]) for r in div.collect()])

    # -- label propagation: 10% seeds over the exact kNN graph
    scored = (
        emb.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("ev"))
        .crossJoin(F.broadcast(emb.select(F.col("vec_id").alias("src"), F.col("embedding").alias("qv"))))
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", F.round(
            similarity.cosine_f64(F.col("ev"), F.col("qv")), 6).alias("score"))
        .filter(F.col("score").isNotNull())
    )
    edges = knn.top_k_per_group(scored, ["src"], "score", 5, tiebreak="dst").select("src", "dst")
    seeds = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("id"), F.col("label").cast("bigint").alias("label")
    )
    propagated = label_propagation(edges, seeds, iters=3)
    labeled = propagated.filter(F.col("label").isNotNull()).count()
    agree = (
        propagated.join(emb.select(F.col("vec_id").alias("id"), F.col("label").cast("bigint").alias("truth")), "id")
        .filter(F.col("label") == F.col("truth"))
        .count()
    )
    print(f"[8] label propagation: {labeled}/{n} labeled from {seeds.count()} seeds; "
          f"{agree}/{labeled} agree with ground truth")

    # -- k-core: dense-community extraction on the cosine threshold graph
    from penr_oz_agent_memory_rust_spark.operators.graph_stats import kcore

    tgraph = scored.filter(F.col("score") > 0.3).select("src", "dst")
    core = kcore(tgraph, k=3)
    print(f"[9] 3-core of the cosine>0.3 graph: {core.count()}/{n} vectors survive the peel")

    # -- time-series monitoring: hourly event counts, gap-filled +
    #    interpolated, then rolling mean/median/std baselines
    from penr_oz_agent_memory_rust_spark.operators import timeseries

    ev_t = load_table(spark, SF_DIR, "events")
    obs = timeseries.resample(ev_t, ["event_type"], "ts", "value", 3600, agg="count")
    dense = timeseries.gap_fill_interpolate(obs, ["event_type"], 3600)
    gaps = dense.filter(F.col("is_gap")).count()
    roll = timeseries.rolling(obs.drop("n_obs"), ["event_type"], "bucket", "v", 24)
    spikes = roll.filter(
        (F.col("roll_std") > 0) & (F.col("v") > F.col("roll_median") + 3 * F.col("roll_std"))
    ).count()
    print(f"[10] series: {dense.count()} grid cells ({gaps} gaps interpolated); "
          f"{spikes} points above median+3*rolling-std")

    # -- streaming sketch: two micro-batches fold into CMS partials; the
    #    live sketch answers heavy hitters without storing tokens
    from penr_oz_agent_memory_rust_spark.functions import hashing as _h
    from penr_oz_agent_memory_rust_spark.operators import sketches
    from penr_oz_agent_memory_rust_spark.streaming.ingest import (
        read_cms_sketch,
        run_cms_ingest_once,
    )

    work = tempfile.mkdtemp(prefix="poz_demo_cms_")
    incoming, sketch = f"{work}/incoming", f"{work}/sketch"
    tok = lambda bdf: bdf.select(F.explode(_h.word_tokens(F.col("text"))).alias("w"))  # noqa: E731
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(incoming)
    run_cms_ingest_once(spark, incoming, sketch, "w", 64, 4, prepare=tok)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(incoming)
    run_cms_ingest_once(spark, incoming, sketch, "w", 64, 4, prepare=tok)
    hh = sketches.cms_estimate(
        tok(docs).distinct(), read_cms_sketch(spark, sketch), "w", width=64, depth=4
    ).orderBy(F.col("est").desc(), "w").limit(5)
    print("[11] streamed-sketch heavy hitters:", [(r["w"], r["est"]) for r in hh.collect()])

    print("\nevaluation & monitoring demo complete")
    spark.stop()


if __name__ == "__main__":
    main()
