"""Crawl-curation demo — the full "raw crawl day in, curated corpus out"
loop, composing the ingest/quality/dedup/versioning layers end to end:

    day 0  bootstrap: gopher-filter the seed crawl, collapse near-dup
           clusters to their best member (neardup_keep_best), store the
           curated corpus + LSH band index + bucket-count companion as
           versioned tables
    day 1  a JSONL batch lands with corrupt lines:
             read_jsonl_rescued   -> parse what parses, QUARANTINE the rest
             gopher_ok_expr       -> drop low-quality docs inline (no join)
             url_dedup_incremental -> recrawls of stored pages dropped by
                                        CANONICAL URL before any content
                                        hashing (the cheapest dedup tier)
             minhash_lsh_incremental -> near-dups vs the STORED index
                                        (O(batch): counts companion)
             append survivors + band rows + touched counts, exactly-once
    replay day 1 -> txn ids make it a no-op

Every stage is the same operator the oracle gates check; this file just
wires them in the order a production crawl pipeline would.

Run: python examples/crawl_curation_demo.py        (~60 s, sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, types as T

from penr_oz_agent_memory_rust_spark.operators import dedup, text_ops, urls
from penr_oz_agent_memory_rust_spark.session import get_spark
from penr_oz_agent_memory_rust_spark.sources.tables import (
    load_table,
    read_jsonl_rescued,
)
from penr_oz_agent_memory_rust_spark.sources.versioned_tables import (
    VersionedParquetTable,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)
BANDS_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("bucket", T.StringType())]
)
COUNTS_SCHEMA = T.StructType(
    [T.StructField("bucket", T.StringType()), T.StructField("cnt", T.LongType())]
)

# the synthetic corpus has only 'the' from the Gopher stop list and short
# docs; same corpus-tuned thresholds the pipeline_curate_corpus gate uses
GOPHER_KW = dict(min_words=20, min_stopword_hits=1)


def main() -> None:
    spark = get_spark(app_name="crawl-curation-demo")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="curation-")

    corpus = VersionedParquetTable(spark, os.path.join(root, "corpus"), DOC_SCHEMA)
    index = VersionedParquetTable(spark, os.path.join(root, "bands"), BANDS_SCHEMA)
    counts = VersionedParquetTable(spark, os.path.join(root, "counts"), COUNTS_SCHEMA)

    # ---- day 0: bootstrap from the seed crawl (80% of docs)
    seed = docs.filter(F.col("doc_id") % 5 > 0)
    quality = seed.filter(text_ops.gopher_ok_expr(F.col("text"), **GOPHER_KW))
    # PLAN the funnel from measured stats instead of hand-picking knobs:
    # a probe banding's calibration table + bucket-size distribution feed
    # plan_dedup_funnel, whose one-row decision table supplies (bands, r,
    # est_threshold, max_bucket) for everything below (oracle gate
    # funnel_plan checks the same arithmetic)
    probe_bands = dedup.lsh_band_rows(quality, n_hashes=12, bands=4)
    plan = dedup.plan_dedup_funnel(
        dedup.minhash_calibration(quality, n_hashes=12, bands=4),
        dedup.lsh_bucket_counts(probe_bands),
        12,
        target_jaccard=0.8,
        recall_floor=0.9,
    ).first()
    n_bands, max_bucket = plan["bands"], plan["max_bucket"]
    print(
        f"funnel plan: bands={n_bands} r={plan['r']} "
        f"(candidate recall {plan['p_at_target']} at J=0.8), "
        f"est_threshold={plan['est_threshold']} "
        f"(est recall {plan['est_recall_at_target']}, "
        f"keeps {plan['keep_frac']} of candidates), max_bucket={max_bucket}"
    )
    # the full funnel AT THE PLANNED KNOBS, consumed DIRECTLY: curate_funnel
    # validates the decision row (bands*r == n_hashes, non-null knobs) and
    # fails loudly on the empty-plan footgun, instead of hand-copying
    # bands/est_threshold/max_bucket out of the row (r9 verdict ask #5).
    # Funnel shape: LSH candidates + sketch estimate -> exact verify of
    # ONLY the est survivors -> keep-best (the 10M-doc measured shape,
    # PLANS.md round-8/9 funnel probes). strip is off: the demo corpus is
    # boilerplate-free sf0.001, so min_df would never fire.
    kept = dedup.curate_funnel(
        seed, plan=plan, jaccard=0.8, strip_min_df=None, **GOPHER_KW
    ).select("doc_id")
    curated = quality.join(F.broadcast(kept), "doc_id")
    corpus.append(curated, txn_app="curate", txn_id=0)
    bands = dedup.lsh_band_rows(curated, n_hashes=12, bands=n_bands)
    index.append(bands, txn_app="curate-idx", txn_id=0)
    counts.append(dedup.lsh_bucket_counts(bands), txn_app="curate-cnt", txn_id=0)
    n_seed, n_curated = seed.count(), corpus.count_rows()
    print(f"day 0: {n_seed} crawled -> {n_curated} curated "
          f"(gopher + near-dup canonicalization)")

    # ---- day 1: a JSONL batch lands, some lines corrupt
    batch_src = docs.filter(F.col("doc_id") % 5 == 0)
    jsonl_dir = os.path.join(root, "day1.jsonl")
    line = F.to_json(F.struct("doc_id", "text"))
    (
        batch_src.select("doc_id", line.alias("j"))
        .select(
            F.when(
                F.col("doc_id") % 7 == 3,
                F.expr("substring(j, 1, length(j) - 5)"),
            )
            .otherwise(F.col("j"))
            .alias("value")
        )
        .coalesce(1)
        .write.mode("overwrite")
        .text(jsonl_dir)
    )

    raw = read_jsonl_rescued(spark, jsonl_dir, "doc_id bigint, text string")
    # one aggregate referencing a data column alongside the corrupt column
    # (a count over a corrupt-only projection is disallowed by the JSON
    # relation — the caveat read_jsonl_rescued documents)
    tallies = raw.agg(
        F.count("*").alias("lines"),
        F.sum(
            F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0)
        ).alias("quarantined"),
        F.count("doc_id").alias("parsed"),
    ).first()
    quarantined = tallies["quarantined"]
    parsed = raw.filter(F.col("_corrupt_record").isNull()).select("doc_id", "text")
    quality1 = parsed.filter(text_ops.gopher_ok_expr(F.col("text"), **GOPHER_KW))

    # URL front stage BEFORE any content hashing: recrawls of pages the
    # corpus already holds are dropped by canonical URL alone (the crawl
    # metadata layer — synthesized here since the demo table has no URL
    # column; every 7th batch doc is a recrawl spelling variant of a
    # stored doc's URL, everything else gets a fresh page)
    def with_urls(df, recrawl_of=None):
        page = (
            F.when(F.col("doc_id") % 7 == 0, F.col("doc_id") % 36)
            if recrawl_of is not None
            else F.col("doc_id") % 36
        )
        return df.withColumn(
            "url",
            F.concat(
                F.when(F.col("doc_id") % 2 == 0, F.lit("HTTP://WWW.")).otherwise(
                    F.lit("http://")
                ),
                F.lit("crawl.example.com"),
                F.lit("/page/"),
                F.when(page.isNotNull(), page).otherwise(
                    F.lit(1000000) + F.col("doc_id")
                ).cast("string"),
                F.when(F.col("doc_id") % 3 == 0, F.lit("/?utm_source=d#f")).otherwise(
                    F.lit("")
                ),
            ),
        )

    seen_urls = urls.url_dedup_keep_best(
        with_urls(corpus.read()), F.lit(1.0)
    ).select("canonical_url")
    n_before_url = quality1.count()
    quality1 = urls.url_dedup_incremental(
        with_urls(quality1, recrawl_of=True), seen_urls
    ).select("doc_id", "text")
    print(
        f"day 1 URL stage: {n_before_url} quality -> {quality1.count()} "
        f"after canonical-URL dedup vs the stored corpus"
    )

    stored_bands, stored_counts = index.read(), counts.read()
    cands = dedup.minhash_lsh_incremental(
        quality1, stored_bands, n_hashes=12, bands=n_bands,
        max_bucket=max_bucket, index_counts=stored_counts,
    )
    # drop batch docs near-duplicating the corpus OR an earlier batch doc
    dup_ids = (
        cands.select(F.col("a").alias("doc_id"))
        .unionByName(cands.select(F.col("b").alias("doc_id")))
        .join(quality1.select("doc_id"), "doc_id", "semi")
        .distinct()
    )
    novel = quality1.join(F.broadcast(dup_ids), "doc_id", "anti")
    corpus.append(novel, txn_app="curate", txn_id=1)
    nb = dedup.lsh_band_rows(novel, n_hashes=12, bands=n_bands)
    index.append(nb, txn_app="curate-idx", txn_id=1)
    delta = dedup.lsh_bucket_counts(nb).withColumnRenamed("cnt", "d_cnt")
    touched = delta.join(
        stored_counts.withColumnRenamed("cnt", "s_cnt"), "bucket", "left"
    ).select(
        "bucket", (F.col("d_cnt") + F.coalesce(F.col("s_cnt"), F.lit(0))).alias("cnt")
    )
    counts.merge_upsert(touched, ["bucket"], txn_app="curate-cnt", txn_id=1)
    print(
        f"day 1: {tallies['lines']} lines -> {quarantined} quarantined, "
        f"{tallies['parsed']} parsed, {quality1.count()} quality, "
        f"{novel.count()} novel appended (corpus v{corpus.current_version()}, "
        f"{corpus.count_rows()} rows)"
    )
    assert quarantined > 0, "corruption injection produced no quarantine"

    # ---- replay day 1: exactly-once txn ids make it a no-op
    v = corpus.current_version()
    corpus.append(novel, txn_app="curate", txn_id=1)
    assert corpus.current_version() == v, "replayed append was not a no-op"
    print(f"replay day 1: corpus still v{v} (exactly-once)")

    # ---- day 2: takedown requests land (licensing / GDPR removals) —
    # the corpus loses the rows (file-pruned delete) and the LSH index +
    # (bucket, cnt) companion are repaired by remove_from_lsh_index
    # (recount-based, idempotent — see the operator docstring)
    victims = [r["doc_id"] for r in corpus.read().limit(2).collect()]
    corpus.delete_keys(victims, "doc_id")
    td = dedup.remove_from_lsh_index(index, counts, victims)
    rebuilt = {
        r["bucket"]: r["cnt"]
        for r in dedup.lsh_bucket_counts(
            dedup.lsh_band_rows(corpus.read(), n_hashes=12, bands=n_bands)
        ).collect()
    }
    stored = {r["bucket"]: r["cnt"] for r in counts.read().collect()}
    assert stored == rebuilt, "takedown left the counts companion stale"
    print(
        f"day 2: takedown of {td['docs_removed']} docs repaired "
        f"{td['buckets_touched']} buckets ({td['buckets_emptied']} emptied); "
        f"companion == fresh rebuild (corpus v{corpus.current_version()}, "
        f"{corpus.count_rows()} rows)"
    )

    # the curated corpus contains no near-dup pair at the index's bands
    residual = dedup.minhash_lsh_pairs(
        corpus.read(), n_hashes=12, bands=n_bands, max_bucket=max_bucket
    ).count()
    print(f"residual candidate pairs inside curated corpus: {residual}")
    spark.stop()


if __name__ == "__main__":
    main()
