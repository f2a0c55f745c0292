"""Vector-serving demo — the ★ ANN/compression surface in one runnable
script, the retrieval-side counterpart of training_pipeline_demo.py:

    embeddings ─ exact top-k (baseline)
               ─ PQ: train codebooks ─ encode ─ ADC search + exact rerank
               ─ IVF-PQ: build cell-partitioned residual index ─ pruned search
               ─ MMR: diversify the final candidate list

Run: python examples/vector_serving_demo.py  [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.functions import similarity
from penr_oz_agent_memory_rust_spark.operators import ivfpq, mmr, pq
from penr_oz_agent_memory_rust_spark.operators.topk import top_k
from penr_oz_agent_memory_rust_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="vector-serving-demo", cpus="4")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]

    print("== exact top-5 (brute force baseline) ==")
    scored = emb.withColumn(
        "score", similarity.cosine_f64(F.col("embedding"), similarity.query_vec_lit(qv, "f64"))
    ).filter(F.col("score").isNotNull())
    top_k(scored, "score", 5, tiebreak="vec_id").select("vec_id", "score").show()

    tmp = tempfile.mkdtemp(prefix="serving_demo_")
    try:
        print("== PQ: 32x-smaller codes, ADC + exact rerank ==")
        books = pq.train_pq_codebooks(emb, m=8, ksub=64, n_iters=5)
        codes = pq.encode_pq(emb, books)
        pq.pq_search_rerank(codes, emb, books, qv, k=5, kprime=50).show()

        print("== IVF-PQ: partition-pruned residual-code search ==")
        idx = os.path.join(tmp, "ivfpq")
        ivfpq.build_ivfpq_index(emb, idx, n_cells=8, m=8, ksub=64, n_iters=5)
        ivfpq.search_ivfpq_index(
            spark, idx, qv, k=5, n_probes=3, kprime=50, rerank=emb
        ).show()

        print("== MMR: diversified final 5 from the top-50 candidates ==")
        cands = top_k(scored, "score", 50, tiebreak="vec_id").select("vec_id", "embedding")
        mmr.mmr_select(cands, qv, k=5, lam=0.7).show()

        print("== takedown: vec_id=0 erased from the serving index ==")
        # the delete half of the serving lifecycle (GDPR / licensing):
        # O(matched files) rewrite, untouched files hardlinked; the
        # self-query must stop returning its own vector afterwards
        stats = ivfpq.remove_from_ivfpq_index(spark, idx, [0])
        print(f"   {stats}")
        post = ivfpq.search_ivfpq_index(
            spark, idx, qv, k=5, n_probes=3, kprime=50, rerank=emb
        )
        assert all(r["vec_id"] != 0 for r in post.collect())
        post.show()

        print("== batch serving: 3 queries in one probe-pruned pass ==")
        queries = emb.filter(F.col("vec_id").isin([5, 17, 42])).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        ivfpq.search_ivfpq_index_batch(
            spark, idx, queries, k=3, n_probes=3, kprime=30, rerank=emb
        ).orderBy("query_id", F.col("score").desc()).show()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
