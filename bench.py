"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query executes end-to-end via the noop sink (full plan, no driver
collect). Session startup is excluded; per-query wall time is reported.
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

HEADLINE = [
    "mem_search_topk",
    "mem_search_threshold",
    "knn_join",
    "knn_join_blocked",
    "lsh_ann",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_char_ngram",
    "dedup_simhash",
    "embedding_neardup",
    "text_lang_id",
    "text_quality_tokens",
    "doc_fingerprint",
    "upsert_latest_by_key",
    "events_window_agg",
    "events_sessionize",
    "tpch_q1_pricing_summary",
    "tpch_q6_revenue",
    "tpch_q14_promo_revenue",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "multimodal_features",
    "ivf_ann",
    "topk_per_group",
    "pipeline_clean_corpus",
    "knn_self_all_pairs",
    "asof_latest_order",
    "doc_chunking",
    "deterministic_sample",
    "distinct_users_per_type",
    "events_rollup",
    "user_running_totals",
    "events_followup_day",
    "zscore_events",
    "sql_api_search",
    "skew_salted_pipeline",
    "events_variant_agg",
    "events_unpivot",
    "events_session_window_native",
    "scd2_customer_segment",
    "stream_window_agg",
    "bm25_search",
    "hybrid_search_rrf",
    "dedup_clusters",
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
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
