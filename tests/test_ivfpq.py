"""IVF-PQ index: build layout, partition-pruned ADC search, residual
advantage over plain PQ, recall with re-rank, determinism."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import ivfpq, memory_store
from penr_oz_agent_memory_rust_spark.plans import explain
from penr_oz_agent_memory_rust_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def index_path(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    coarse, books = ivfpq.build_ivfpq_index(
        emb, path, n_cells=8, m=8, ksub=64, n_iters=5
    )
    assert coarse.shape == (8, 64) and books.shape == (8, 64, 8)
    return path


def test_layout_partitioned_with_sidecar(index_path):
    cells = [d for d in os.listdir(f"{index_path}/data") if d.startswith("ivf_cell=")]
    assert len(cells) >= 2
    assert os.path.exists(f"{index_path}/model.json")


def test_train_deterministic(emb):
    a = ivfpq.train_ivfpq(emb, n_cells=4, m=8, ksub=16, n_iters=3)
    b = ivfpq.train_ivfpq(emb, n_cells=4, m=8, ksub=16, n_iters=3)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_search_prunes_partitions(spark, emb, index_path):
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    df = ivfpq.search_ivfpq_index(spark, index_path, qv, k=5, n_probes=2)
    plan = explain.physical_plan(df)
    assert "PartitionFilters" in plan
    part_section = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "ivf_cell" in part_section, part_section


def test_self_match_and_rerank_recall(spark, emb, index_path):
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    out = ivfpq.search_ivfpq_index(
        spark, index_path, qv, k=10, n_probes=4, kprime=100, rerank=emb
    )
    rows = out.collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["score"] == 1.0
    mem = emb.select(
        F.col("vec_id").cast("string").alias("id"),
        F.lit("t").alias("text"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.lit(None).cast("string").alias("session"),
        "embedding",
        F.lit(None).cast("timestamp").alias("created_at"),
    )
    exact = [int(r["id"]) for r in memory_store.search(mem, qv, limit=10).collect()]
    got = [r["vec_id"] for r in rows]
    # 4-of-8 probes on uniform-random data (the PQ worst case): half the
    # corpus is never scanned, so bound the overlap rather than demand it
    overlap = len(set(got) & set(exact))
    assert overlap >= 5, f"IVFPQ top-10 overlap too low: {overlap}"


def test_residual_codes_beat_plain_pq(emb):
    """Residual encoding must reconstruct better than codebooks fit on raw
    vectors with the same budget — the reason IVFADC exists."""
    from penr_oz_agent_memory_rust_spark.operators import pq

    X = np.asarray(
        [r["embedding"] for r in emb.select("embedding").orderBy(F.rand(1)).collect()],
        dtype=np.float32,
    )
    coarse, books = ivfpq.train_ivfpq(emb, n_cells=8, m=8, ksub=32, n_iters=5)
    d2 = (
        (X * X).sum(axis=1, keepdims=True)
        - 2.0 * (X @ coarse.T)
        + (coarse * coarse).sum(axis=1)[None, :]
    )
    cells = np.argmin(d2, axis=1)
    R = X - coarse[cells]
    dsub = 8

    def recon_err(vecs, bks):
        err = 0.0
        for j in range(8):
            S = vecs[:, j * dsub : (j + 1) * dsub]
            B = bks[j]
            dj = (
                (S * S).sum(axis=1, keepdims=True)
                - 2.0 * (S @ B.T)
                + (B * B).sum(axis=1)[None, :]
            )
            err += float(np.maximum(dj.min(axis=1), 0.0).sum())
        return err / len(vecs)

    ivfpq_err = recon_err(R, books)
    plain_books = pq.train_pq_codebooks(emb, m=8, ksub=32, n_iters=5)
    plain_err = recon_err(X, plain_books)
    assert ivfpq_err < plain_err, (ivfpq_err, plain_err)


def test_query_dim_mismatch_raises(spark, index_path):
    with pytest.raises(ValueError, match="query dim"):
        ivfpq.search_ivfpq_index(spark, index_path, [0.0] * 10)


def test_ivfpq_append_searchable_without_retrain(spark, sf_dir, tmp_path):
    """append_to_ivfpq_index: new vectors are encoded with the STORED
    model (shared _encode_with_model — byte-identical codes to a build
    over the same rows) and become immediately searchable."""
    emb300 = load_table(spark, sf_dir, "embeddings").limit(300)
    path = str(tmp_path / "ivfpq_app")
    ivfpq.build_ivfpq_index(emb300, path, n_cells=4, m=8, ksub=16, n_iters=3)
    extra = load_table(spark, sf_dir, "embeddings").filter(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 350)
    )
    ivfpq.append_to_ivfpq_index(extra, path)
    qv = [float(x) for x in extra.filter(F.col("vec_id") == 320).first()["embedding"]]
    hits = ivfpq.search_ivfpq_index(spark, path, qv, k=3, n_probes=4).collect()
    assert hits[0]["vec_id"] == 320  # ADC self-match on the appended row


def test_ivfpq_snapshot_carries_model_and_rollback_restores_it(spark, sf_dir, tmp_path):
    """The r10 sidecar generalization: a snapshot must carry model.json
    (an IVF-PQ index restored without its quantizer is unreadable), and
    rollback after a RETRAIN — which rewrites both the codes AND the
    model — must restore byte-identical search results."""
    from penr_oz_agent_memory_rust_spark.operators import ivf_index

    emb300 = load_table(spark, sf_dir, "embeddings").limit(300)
    path = str(tmp_path / "ivfpq_snap")
    ivfpq.build_ivfpq_index(emb300, path, n_cells=4, m=8, ksub=16, n_iters=3)
    qv = [float(x) for x in emb300.filter(F.col("vec_id") == 7).first()["embedding"]]
    before = [
        (r["vec_id"], r["adc"])
        for r in ivfpq.search_ivfpq_index(spark, path, qv, k=5, n_probes=4).collect()
    ]
    m = ivf_index.snapshot_ivf_index(path, tag="pre-retrain")
    assert os.path.exists(os.path.join(path, "snapshots", "v0001", "model.json"))
    # retrain with DIFFERENT geometry: model.json and the codes both change
    ivfpq.build_ivfpq_index(emb300, path, n_cells=2, m=4, ksub=8, n_iters=2)
    mutated = [
        (r["vec_id"], r["adc"])
        for r in ivfpq.search_ivfpq_index(spark, path, qv, k=5, n_probes=2).collect()
    ]
    ivf_index.rollback_ivf_index(path, m["version"])
    after = [
        (r["vec_id"], r["adc"])
        for r in ivfpq.search_ivfpq_index(spark, path, qv, k=5, n_probes=4).collect()
    ]
    assert after == before
    assert mutated != before or len(mutated) == len(before)


def test_batch_search_matches_single_query_path(spark, sf_dir, tmp_path):
    """search_ivfpq_index_batch over a 2-row query side agrees with the
    single-query path per query: same ADC candidates, and (with rerank)
    same exact-cosine top-k — both with and without rerank."""
    emb300 = load_table(spark, sf_dir, "embeddings").limit(300)
    path = str(tmp_path / "ivfpq_batch")
    ivfpq.build_ivfpq_index(emb300, path, n_cells=4, m=8, ksub=16, n_iters=3)
    qids = [3, 41]
    queries = emb300.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    batch_adc = ivfpq.search_ivfpq_index_batch(
        spark, path, queries, k=5, n_probes=3
    ).collect()
    batch_rr = ivfpq.search_ivfpq_index_batch(
        spark, path, queries, k=5, n_probes=3, kprime=30, rerank=emb300
    ).collect()
    for qid in qids:
        qv = [
            float(x)
            for x in emb300.filter(F.col("vec_id") == qid).first()["embedding"]
        ]
        single_adc = ivfpq.search_ivfpq_index(
            spark, path, qv, k=5, n_probes=3
        ).collect()
        got_adc = sorted(
            [(r["vec_id"], round(r["adc"], 4)) for r in batch_adc if r["query_id"] == qid]
        )
        want_adc = sorted([(r["vec_id"], round(r["adc"], 4)) for r in single_adc])
        assert got_adc == want_adc, qid
        single_rr = ivfpq.search_ivfpq_index(
            spark, path, qv, k=5, n_probes=3, kprime=30, rerank=emb300
        ).collect()
        got_rr = sorted(
            [(r["vec_id"], r["score"]) for r in batch_rr if r["query_id"] == qid]
        )
        want_rr = sorted([(r["vec_id"], r["score"]) for r in single_rr])
        assert got_rr == want_rr, qid
    # empty query side fails loudly
    import pytest as _p

    with _p.raises(ValueError, match="empty query frame"):
        ivfpq.search_ivfpq_index_batch(spark, path, queries.limit(0))


def test_batch_search_prunes_partitions(spark, sf_dir, tmp_path):
    from penr_oz_agent_memory_rust_spark.plans import explain

    emb300 = load_table(spark, sf_dir, "embeddings").limit(300)
    path = str(tmp_path / "ivfpq_prune")
    ivfpq.build_ivfpq_index(emb300, path, n_cells=4, m=8, ksub=16, n_iters=3)
    queries = emb300.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    df = ivfpq.search_ivfpq_index_batch(spark, path, queries, k=5, n_probes=2)
    plan = explain.physical_plan(df)
    assert "PartitionFilters" in plan
    part = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "ivf_cell" in part, part
