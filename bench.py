"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf", "runs"}.

Each query executes end-to-end via the noop sink (full plan, no driver
collect). Session startup is excluded. Every query runs
$SPARK_GRAFT_BENCH_RUNS times (default 3) in interleaved rounds and the
per-query MINIMUM is reported — single-run numbers on this shared VM move
±25% run-to-run, which would drown any real regression signal.

Output contract (rounds 3 AND 4 shipped `parsed: null` because the
stdout line outgrew the driver's 2,000-byte tail capture and lost its
head): stdout carries ONLY a ~120-byte summary line
{"metric","value","unit","sf","runs","n_queries"} — never the per-query
dict. The FULL result (per-query mins, per-run samples, spread, and the
exact stdout line under "stdout_line" so the committed record and the
driver's capture cannot diverge) is written to `BENCH_LOCAL.json` next
to this file.

A cumulative per-query minima ledger is merge-written to
`BENCH_MINIMA.json` (min across ALL recorded runs at the current sf;
reset on sf change; disable with SPARK_GRAFT_BENCH_MINIMA=0) so
cross-round regression adjudication compares stable minima instead of
single records that drift ±25-40% with VM background load.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from penr_oz_agent_memory_rust_spark.session import get_spark

# The driver-checked gate window (one per operator, merged gates included)
# plus the no-oracle ANN strategies — so BENCH rows line up 1:1 with
# CORRECTNESS rows.
HEADLINE = [
    "mem_search_topk",
    "mem_search_filters",
    "mem_delete_anti_join",
    "upsert_latest_by_key",
    "session_pagination",
    "session_touch",
    "fk_integrity",
    "json_metadata_extract",
    "projection_validate",
    "distance_metrics",
    "sql_api_search",
    "dedup_exact_suite",
    "url_canonicalize",
    "url_dedup",
    "url_domain_block",
    "url_dedup_incremental",
    "extract_links",
    "dedup_minhash_lsh",
    "dedup_ngram_suite",
    "dedup_simhash",
    "embedding_neardup",
    "dedup_clusters",
    "knn_suite",
    "bm25_search",
    "hybrid_search_rrf",
    "quantized_search",
    "text_profile",
    "decontaminate_ngram",
    "word_freq_topk",
    "pii_scan",
    "sampling_suite",
    "quality_quantile_filter",
    "zscore_events",
    "doc_chunking",
    "pipeline_clean_corpus",
    "multimodal_features",
    "multimodal_pipeline",
    "training_shards",
    "corpus_mix",
    "stream_window_agg",
    "stream_dedup_distinct",
    "stream_ivf_append",
    "sessionization",
    "asof_join_suite",
    "events_followup_day",
    "scd2_customer_segment",
    "skew_salted_pipeline",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_q14",
    "events_multidim_agg",
    "events_window_frames",
    "events_unpivot",
    "events_variant_agg",
    "doc_bigrams_udtf",
    "knn_join_blocked",
    "lsh_ann",
    "lsh_ann_multiprobe",
    "ivf_ann",
    "pq_ann",
    "ivfpq_ann",
    "bq_ann",
    "bq_ann_rerank",
    "bq_neardup",
    "ts_gapfill_interp",
    "mutual_knn",
    "semantic_decontaminate",
    "versioned_merge_pruned",
    "rolling_series_stats",
    "stream_cms_topk",
    "kmeans_assign",
    "kmeans_profile",
    "centroid_classifier",
    "quality_classifier_train",
    "mmr_rerank",
    "jl_projected_ann",
    "knn_self_all_pairs",
    "knn_graph_lsh",
    "sequence_packing",
    "lm_quality",
    "lm_quality_arrow",
    "diversity_sample",
    "funnel_conversion",
    "bpe_tokenize",
    "stream_enrich_counts",
    "data_expectations",
    "retention_cohorts",
    "dedup_keep_best",
    "repetition_profile",
    "winnowing_fps",
    "semantic_dedup",
    "dsir_select",
    "stream_session_window",
    "stream_interval_join",
    "stream_interval_join_outer",
    "line_dedup",
    "dup_span_coverage",
    "remove_dup_spans",
    "heavy_hitters_cms",
    "approx_distinct_hll",
    "preference_pairs",
    "leakage_safe_split",
    "dedup_incremental_bloom",
    "knn_pagerank",
    "retrieval_eval",
    "pca_gramian",
    "embedding_outliers",
    "pca_projected_ann",
    "stream_embedding_drift",
    "source_divergence",
    "label_propagation",
    "pmi_collocations",
    "psi_value_drift",
    "events_transition_matrix",
    "mad_outliers",
    "tfidf_keywords",
    "source_overlap",
    "quality_quantile_by_lang",
    "knn_graph_triangles",
    "lm_backoff_quality",
    "fuzzy_part_matches",
    "quality_winsorize",
    "corpus_mix_temperature",
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q21_waiting_supplier",
    "tpch_q13_order_distribution",
    "tpch_q18_large_volume",
    "cdc_chunking",
    "vocab_coverage",
    "seasonal_anomalies",
    "html_strip",
    "fuzzy_best_match",
    "events_value_ranks",
    "stream_cdc_dedup",
    "corpus_datasheet",
    "knn_graph_walks",
    "zorder_values",
    "incremental_agg_refresh",
    "incremental_quantile_refresh",
    "media_phash_dedup",
    "knn_kcore",
    "versioned_time_travel",
    "versioned_schema_evolution",
    "versioned_optimize_read",
    "versioned_cdf_refresh",
    "stream_cdc_merge",
    "quality_exact_quantiles",
    "doc_quantile_buckets",
    "events_value_histogram",
    "weighted_doc_sample",
    "events_pivot_matrix",
    "ngram_containment",
    "langid_confusion",
    "jl_exact_ann",
    "text_normalize",
    "incremental_neardup",
    "kfold_split",
    "gopher_rules",
    "neardup_keep_best",
    "jsonl_rescue",
    "pipeline_curate_corpus",
    "strip_boilerplate",
    "pipeline_curate_funnel",
    "strip_common_lines",
    "funnel_plan",
    "shard_checksums",
    "webdataset_roundtrip",
    "skew_report",
    "minhash_est_pairs",
    "minhash_calibration",
    "kfold_balance",
    "diversity_sample_seeded",
    "knn_self_all_pairs_expr",
    "semantic_decontaminate_blas",
    # r8 additions
    "skew_salted_targeted",
    "dedup_funnel_verify",
    "source_quality_profile",
    "source_curation",
    "asof_global",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="poz-bench")
    qs = entrymod.queries()
    # warmup: JVM/codegen/parquet-footer caches AND the one-time package
    # shipping (zip + addPyFile) that the first queries() call triggers, so
    # per-query numbers reflect steady state rather than session startup
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in ("embeddings", "documents", "lineitem", "events", "orders", "customer"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count() if t != "events" else None
    qs["deterministic_sample"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # warm the Python worker pool too: one tiny Arrow-batched UDF job that
    # touches every core forks the daemon workers and imports pandas/numpy
    # in each, so the first Python-path query measures the operator, not
    # interpreter startup
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(v: pd.Series) -> pd.Series:
        import numpy as np

        return v * np.float64(1.0)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    (
        spark.range(cpus * 2)
        .repartition(cpus)
        .select(_warm(F.col("id").cast("double")))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # wall-clock budget: the headline list has grown past 90 queries, and
    # the driver's capture window is finite — finish the CURRENT round and
    # stop if the budget is spent (every query always has >= 1 sample
    # because the budget is only checked between rounds)
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "400"))
    bench_start = time.time()
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    # interleaved rounds (q1..qN, q1..qN, ...) rather than back-to-back
    # repeats: VM noise is bursty, so spreading a query's runs across the
    # whole wall-clock window decorrelates them from any one burst
    runs_done = 0
    for _ in range(runs):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))
        runs_done += 1
        if time.time() - bench_start > budget:
            break
    timings = {name: min(ts) for name, ts in samples.items()}
    # per-query run variance: max-min over the interleaved runs, so a
    # cross-round regression can be told apart from VM noise (a delta
    # smaller than the query's spread is not a signal)
    spread = {name: round(max(ts) - min(ts), 3) for name, ts in samples.items()}
    total = round(sum(timings.values()), 3)
    # stdout carries ONLY this line, and it must fit the driver's 2,000-byte
    # tail-capture window WHOLE (r3 and r4 both shipped `parsed: null`
    # because the per-query dict pushed the line's head past the window).
    # ~120 bytes: summary fields only — the 139-entry per-query dict lives
    # exclusively in the sidecar.
    compact = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "runs": runs_done,
        "n_queries": len(timings),
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 1000, f"stdout line grew to {len(line)} bytes"
    # the sidecar records the EXACT stdout line alongside the full result
    # (per-query mins, spread, raw samples), so the committed record and
    # the driver's capture can never diverge silently
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")
    with open(sidecar, "w") as f:
        json.dump(
            {**compact, "stdout_line": line, "queries": timings,
             "spread": spread, "samples": samples},
            f,
            indent=1,
        )
    # per-query minima ledger: same-code records on this shared VM spread
    # 172-203s on background load alone, so regression adjudication needs
    # the min-over-ALL-recorded-runs, not any single record. Merge-write
    # min(prior, this run) per query; reset if sf changes (minima are only
    # comparable at one scale). Disable with SPARK_GRAFT_BENCH_MINIMA=0.
    if os.environ.get("SPARK_GRAFT_BENCH_MINIMA", "1") != "0":
        ledger_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_MINIMA.json"
        )
        try:
            with open(ledger_path) as f:
                ledger = json.load(f)
            if ledger.get("sf") != sf:
                ledger = {"sf": sf, "minima": {}, "n_records": 0}
        except (OSError, ValueError):
            ledger = {"sf": sf, "minima": {}, "n_records": 0}
        prior = ledger.get("minima", {})
        ledger["minima"] = {
            name: round(min(t, prior.get(name, t)), 3)
            for name, t in timings.items()
        }
        # keep minima for queries not in this run's HEADLINE (rotations)
        for name, t in prior.items():
            ledger["minima"].setdefault(name, t)
        ledger["n_records"] = int(ledger.get("n_records", 0)) + 1
        ledger["minima"] = dict(sorted(ledger["minima"].items()))
        with open(ledger_path, "w") as f:
            json.dump(ledger, f, indent=1)
    sys.stdout.flush()
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
