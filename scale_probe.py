"""Scale probe: runs the scale-critical operators on synthetically inflated
data (10-50× the sf0.1 tables, generated in a temp dir) to check that the
plans behave at larger N — the local stand-in for the 100×/1000× question.

Not part of the driver's bench; run ad hoc:  python scale_probe.py
Prints one JSON line with rows processed and per-op wall times.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import dedup, knn
from penr_oz_agent_memory_rust_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EMB_COPIES = int(os.environ.get("SCALE_EMB_COPIES", "25"))  # 2k -> 50k vectors
DOC_COPIES = int(os.environ.get("SCALE_DOC_COPIES", "10"))  # 5k -> 50k docs
LI_COPIES = int(os.environ.get("SCALE_LI_COPIES", "10"))  # 600k -> 6M rows


def inflate(df, copies: int, id_col: str, stride: int):
    """Union `copies` shifted replicas — synthetic scale with distinct keys.
    A small deterministic per-copy jitter column keeps vector replicas from
    being byte-identical."""
    parts = []
    for c in range(copies):
        parts.append(df.withColumn(id_col, F.col(id_col) + F.lit(c * stride)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def recall_probe() -> None:
    """Measure recall@k + runtime of the approximate ANN paths against
    exact top-k on the sf0.1 embeddings (`python scale_probe.py recall`).
    The grid answers "which (planes, tables, probes) settings clear 0.95
    recall, and what does each cost" — results recorded in PLANS.md and
    reflected in the operators' defaults."""
    import shutil
    import tempfile

    from penr_oz_agent_memory_rust_spark.operators import ivf_index

    spark = get_spark(app_name="poz-recall-probe")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    n = emb.count()
    k = 10
    n_queries = 200
    q = (
        emb.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        .cache()
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    q.count()

    exact = knn.expr_knn_join(
        q, c, k=k, query_id="qid", query_vec="qv", corpus_id="cid", corpus_vec="cvec"
    )
    truth: dict[int, set] = {}
    for r in exact.collect():
        truth.setdefault(r["qid"], set()).add(r["cid"])

    def recall_of(df, id_col="cid"):
        hits = 0
        for r in df.collect():
            if r[id_col] in truth.get(r["qid"], ()):  # noqa: SIM401
                hits += 1
        return round(hits / (len(truth) * k), 4)

    results = []
    for planes, tables in [(4, 8), (4, 16), (4, 24), (4, 32), (5, 16), (6, 16)]:
        t0 = time.time()
        approx = knn.lsh_knn_join_multiprobe(
            q, c, k=k, n_planes=planes, n_tables=tables,
            query_id="qid", query_vec="qv", corpus_id="cid", corpus_vec="cvec",
        )
        rec = recall_of(approx)
        results.append(
            {
                "op": "lsh_multiprobe",
                "planes": planes,
                "tables": tables,
                "recall_at_10": rec,
                "sec": round(time.time() - t0, 2),
            }
        )

    for n_cents, probes_list in [(8, (2, 4, 6, 7)), (16, (4, 8, 12)), (32, (8,))]:
        path = tempfile.mkdtemp(prefix="poz_recall_ivf_")
        try:
            t0 = time.time()
            ivf_index.build_ivf_index(
                emb, path, id_col="vec_id", vec_col="embedding",
                n_centroids=n_cents, n_iters=5,
            )
            build_s = round(time.time() - t0, 2)
            for probes in probes_list:
                t0 = time.time()
                approx = ivf_index.search_ivf_index_batch(
                    spark, path, q, k=k, n_probes=probes,
                    query_id="qid", query_vec="qv",
                    id_col="vec_id", vec_col="embedding",
                )
                rec = recall_of(approx, id_col="vec_id")
                results.append(
                    {
                        "op": "ivf",
                        "centroids": n_cents,
                        "probes": probes,
                        "build_sec": build_s,
                        "recall_at_10": rec,
                        "sec": round(time.time() - t0, 2),
                    }
                )
        finally:
            shutil.rmtree(path, ignore_errors=True)

    print(json.dumps({"corpus_rows": n, "queries": len(truth), "k": k, "grid": results}))
    spark.stop()


def main() -> None:
    spark = get_spark(app_name="poz-scale-probe")
    t = {}
    out_rows = {}

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    big_emb = inflate(emb, EMB_COPIES, "vec_id", 1_000_000).cache()
    n_emb = big_emb.count()

    # all-pairs KNN graph over the inflated corpus (2-D block nested loop —
    # the no-driver-collect path; blocked_knn_join now guards against
    # corpus-scale query sides)
    q = big_emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    c = big_emb.select("vec_id", F.col("embedding").alias("vec"))
    t0 = time.time()
    out_rows["knn_all_pairs"] = knn.blocked_knn_self_join(
        c, k=3, id_col="vec_id", vec_col="vec"
    ).count()
    t["knn_all_pairs"] = round(time.time() - t0, 2)

    # LSH ANN over the same corpus (shuffle-bound path)
    t0 = time.time()
    out_rows["lsh_ann"] = knn.lsh_knn_join(
        q.limit(512), c, k=5, n_planes=8,
        query_id="qid", corpus_id="vec_id", query_vec="qv", corpus_vec="vec",
    ).count()
    t["lsh_ann"] = round(time.time() - t0, 2)

    # approximate kNN GRAPH: the scale alternative to the exact all-pairs
    # plan above — bucket-collision pairs instead of N² scores. Measured on
    # DISTINCT synthesized vectors: the inflated corpus is EMB_COPIES exact
    # clones of each embedding, and clone pairs collide in every LSH table
    # (the operator's documented degenerate case — dedup first on real data)
    distinct_vecs = (
        spark.range(n_emb)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 64), i -> cast(sin(id * i + i) as float))"
            ).alias("vec"),
        )
        .cache()  # materialize synthesis once: the graph reads the corpus
    )
    distinct_vecs.count()  # twice (signatures + bucket groups)
    t0 = time.time()
    out_rows["knn_graph_lsh"] = knn.lsh_knn_self_join(
        distinct_vecs, k=3, n_planes=9, n_tables=8, id_col="vec_id", vec_col="vec"
    ).count()
    t["knn_graph_lsh"] = round(time.time() - t0, 2)
    distinct_vecs.unpersist()
    big_emb.unpersist()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big_docs = inflate(docs, DOC_COPIES, "doc_id", 1_000_000)
    t0 = time.time()
    out_rows["minhash_lsh"] = dedup.minhash_lsh_pairs(big_docs).count()
    t["minhash_lsh"] = round(time.time() - t0, 2)

    t0 = time.time()
    out_rows["exact_dedup"] = dedup.exact_dedup(big_docs).count()
    t["exact_dedup"] = round(time.time() - t0, 2)

    # training-shard assignment: the bucketed global rank must scale as a
    # bucket-count-bounded pair of passes, not a global window
    from penr_oz_agent_memory_rust_spark.operators import export, packing
    from penr_oz_agent_memory_rust_spark.operators.corpus import corpus_mixture_sample

    t0 = time.time()
    out_rows["training_shards"] = export.assign_shards(
        big_docs.select("doc_id"), "doc_id", rows_per_shard=4096, bucket_chars=3
    ).count()
    t["training_shards"] = round(time.time() - t0, 2)

    t0 = time.time()
    out_rows["corpus_mix"] = corpus_mixture_sample(
        big_docs.select("doc_id", "lang"),
        {"en": 0.5, "de": 0.2, "fr": 0.2, "es": 0.1},
        n_total=big_docs.count() // 2,
    ).count()
    t["corpus_mix"] = round(time.time() - t0, 2)

    t0 = time.time()
    out_rows["sequence_packing"] = packing.pack_sequences(
        big_docs.select("doc_id", "text"), token_budget=512, n_buckets=64
    ).count()
    t["sequence_packing"] = round(time.time() - t0, 2)

    # LM quality scoring: train on a fixed slice, score the inflated corpus
    from penr_oz_agent_memory_rust_spark.operators.corpus import (
        char_bigram_counts,
        lm_quality_score,
    )

    t0 = time.time()
    lm = char_bigram_counts(big_docs.filter(F.col("doc_id") < 5000))
    out_rows["lm_quality"] = lm_quality_score(big_docs, lm).count()
    t["lm_quality"] = round(time.time() - t0, 2)

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    big_li = inflate(li, LI_COPIES, "l_orderkey", 100_000_000)
    t0 = time.time()
    out_rows["tpch_q1"] = (
        big_li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .count()
    )
    t["tpch_q1"] = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "emb_rows": n_emb,
                "doc_rows": docs.count() * DOC_COPIES,
                "lineitem_rows": li.count() * LI_COPIES,
                "times_sec": t,
                "out_rows": out_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "recall":
        recall_probe()
    else:
        main()
