"""End-to-end training-data pipeline demo — the ★ LLM-pipeline surface in
one runnable script, the counterpart of examples/agent_demo.py for the
batch side:

    documents ─ profile ─ quality filter ─ exact+near dedup (keep best)
              ─ duplicate-span rewrite ─ decontaminate vs a held-out set
              ─ CMS/HLL vocabulary sketches ─ token-budget mixture
              ─ fixed-size training shards (written to disk)
    embeddings ─ build IVF index ─ STREAM-append the rest ─ compact
               ─ push to an external ANN store (local mock here)

Run: python examples/training_pipeline_demo.py        (~1 min, sf0.001)
Every step is the same oracle-checked operator the driver gates; this
script only chains them.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import (
    corpus,
    dedup,
    export,
    ivf_index,
    text_ops,
)
from penr_oz_agent_memory_rust_spark.session import get_spark
from penr_oz_agent_memory_rust_spark.sources.tables import load_table
from penr_oz_agent_memory_rust_spark.streaming.ingest import run_ivf_append_once

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="poz-training-pipeline-demo")
    work = tempfile.mkdtemp(prefix="poz_pipeline_demo_")
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()
    print(f"[1] corpus: {n0} docs from {SF_DIR}")

    # -- profile + quality gate (one scan, all native expressions)
    profile = text_ops.analyze_documents(docs)
    scored = docs.join(profile.select("doc_id", "quality"), "doc_id")
    kept = corpus.quality_quantile_filter(scored, "quality", q=0.25)
    print(f"[2] quality gate (drop bottom quartile): {kept.count()} docs")

    # -- canonical dedup: among exact duplicates keep the best-quality copy
    best = dedup.exact_dedup_keep_best(kept, F.col("quality"))
    canon = kept.join(best.select("doc_id"), "doc_id")
    print(f"[3] exact dedup keep-best: {canon.count()} docs")

    # -- near-dup pruning via MinHash+LSH (drop the higher id of each pair)
    pairs = dedup.minhash_lsh_pairs(canon)  # (a, b) id pairs, a < b
    losers = pairs.select(F.col("b").alias("doc_id")).distinct()
    canon = canon.join(losers, "doc_id", "left_anti")
    print(f"[4] minhash near-dup prune: {canon.count()} docs")

    # -- substring-level cleanup: cut spans duplicated across surviving
    # docs (first occurrence keeps its copy), then drop docs that lost
    # more than half their tokens
    rewritten = dedup.remove_dup_spans(canon, k=5, min_docs=2)
    canon = (
        canon.join(rewritten.select("doc_id", "n_tokens", "n_removed", "text_clean"), "doc_id")
        .filter(F.col("n_removed") * 2 <= F.col("n_tokens"))
        .select("doc_id", F.col("text_clean").alias("text"), "lang", "source", "quality")
    )
    print(f"[5] duplicate-span rewrite (drop >50%-cut docs): {canon.count()} docs")

    # -- decontaminate against a pretend eval set (every 37th doc)
    evalset = docs.filter(F.col("doc_id") % 37 == 0).select("doc_id", "text")
    dirty = corpus.decontaminate(canon, evalset, n=3).filter(F.col("n_overlap") >= 5)
    canon = canon.join(dirty.select("doc_id"), "doc_id", "left_anti")
    print(f"[6] decontaminated: {canon.count()} docs")

    # -- bounded-memory corpus surveillance: CMS heavy hitters + HLL
    # distinct-token estimate (constant-size sketches however big the
    # corpus; both oracle-checked operators)
    from penr_oz_agent_memory_rust_spark.functions import hashing as _hashing
    from penr_oz_agent_memory_rust_spark.operators import sketches

    toks = canon.select(F.explode(_hashing.word_tokens(F.col("text"))).alias("w"))
    hot = sketches.cms_heavy_hitters(toks, "w", k=3, width=1024).collect()
    vocab_est = sketches.hll_distinct(toks, "w", m=64).first()["est"]
    print(
        f"[7] sketches: top tokens {[(r['w'], r['est']) for r in hot]}, "
        f"~{vocab_est:.0f} distinct tokens (HLL)"
    )

    # -- token-budget mixture over languages
    langs = [r[0] for r in canon.select("lang").distinct().collect()]
    weights = {lang: 1.0 for lang in langs}
    mixture = corpus.corpus_token_mixture(
        canon.select("doc_id", "text", "lang"), weights, token_budget=20_000
    )
    print(f"[8] token mixture ({len(langs)} langs, 20k budget): {mixture.count()} docs")

    # -- fixed-size shards on disk
    shards_path = os.path.join(work, "shards")
    n_shards = export.write_training_shards(
        mixture.select("doc_id", "text"), shards_path, "doc_id", rows_per_shard=64
    )
    # loader-integrity manifest: recomputing it from the written shards
    # must reproduce the pre-write checksums exactly (what a loader or a
    # re-export on another cluster verifies against)
    sharded = export.assign_shards(
        mixture.select("doc_id", "text"), "doc_id", rows_per_shard=64
    )
    manifest = {
        r["shard"]: (r["n_rows"], r["checksum"])
        for r in export.shard_checksums(sharded, F.col("text")).collect()
    }
    reread = spark.read.parquet(shards_path)  # shard back as partition col
    again = {
        r["shard"]: (r["n_rows"], r["checksum"])
        for r in export.shard_checksums(reread, F.col("text")).collect()
    }
    assert again == manifest, "shard manifest mismatch after write/read"
    print(
        f"[9] wrote {n_shards} training shards -> {shards_path} "
        f"(manifest verified: {len(manifest)} checksums match after re-read)"
    )

    # -- ANN index: batch-build half, STREAM-append the rest, compact
    emb = load_table(spark, SF_DIR, "embeddings")
    index_path = os.path.join(work, "ivf")
    ivf_index.build_ivf_index(
        emb.filter(F.col("vec_id") % 2 == 0), index_path, n_centroids=4, n_iters=3
    )
    inbox = os.path.join(work, "inbox")
    emb.filter(F.col("vec_id") % 2 == 1).write.parquet(inbox)
    run_ivf_append_once(spark, inbox, index_path)
    stats = ivf_index.compact_ivf_index(spark, index_path)
    print(
        f"[10] IVF index: streamed append + compaction "
        f"({stats['files_before']} -> {stats['files_after']} files, {stats['cells']} cells)"
    )
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    hits = ivf_index.search_ivf_index(spark, index_path, qv, k=3, n_probes=2).collect()
    print(f"[11] probe-limited search: {[(r['vec_id'], round(r['score'], 4)) for r in hits]}")

    # -- push the sink layout to an external store (local mock server)
    from tests.test_ann_push import MockStore, _Handler  # reuse the test mock

    import threading
    from http.server import ThreadingHTTPServer

    from penr_oz_agent_memory_rust_spark.sources import ann_sink
    from penr_oz_agent_memory_rust_spark.sources.ann_push import (
        AnnStoreClient,
        push_ann_index,
    )

    sink_path = os.path.join(work, "sink")
    ann_sink.write_ann_index(
        emb.limit(200), sink_path, id_col="vec_id", vec_col="embedding", n_centroids=4
    )
    store = MockStore()
    handler = type("H", (_Handler,), {"store": store})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    client = AnnStoreClient(
        f"http://127.0.0.1:{srv.server_address[1]}", "agent_memory"
    )
    push_stats = push_ann_index(spark, sink_path, client, batch_size=64)
    srv.shutdown()
    print(f"[12] pushed to external store: {json.dumps(push_stats)}")
    assert len(store.points["agent_memory"]) == push_stats["points"]

    print("\npipeline complete:", work)
    spark.stop()


if __name__ == "__main__":
    main()
