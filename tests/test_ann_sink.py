"""External ANN-index sink: build -> reload -> search parity, manifest,
upsert-batch shape, reserved-key gate."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.errors import ValidationError
from penr_oz_agent_memory_rust_spark.operators import knn
from penr_oz_agent_memory_rust_spark.sources import ann_sink
from penr_oz_agent_memory_rust_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("annsink") / "idx")
    emb = load_table(spark, sf_dir, "embeddings")
    manifest = ann_sink.write_ann_index(
        emb, path, id_col="vec_id", vec_col="embedding",
        payload_cols=["label"], n_centroids=8, n_iters=3,
    )
    assert manifest["n_points"] == emb.count()
    return path


def test_layout_and_manifest(spark, index_path):
    m = ann_sink.read_manifest(index_path)
    assert m["metric"] == "cosine" and m["dim"] == 64
    assert sum(m["cells"].values()) == m["n_points"]
    assert os.path.exists(os.path.join(index_path, "centroids.json"))
    cells_on_disk = {
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(index_path, "points"))
        if d.startswith("ivf_cell=")
    }
    assert cells_on_disk == {int(c) for c in m["cells"]}


def test_roundtrip_full_probe_matches_exact_topk(spark, sf_dir, index_path):
    """Probing ALL cells makes the index search exhaustive: top-k ids must
    equal the exact brute-force top-k over the source table (round-trip:
    build -> reload -> same answer)."""
    emb = load_table(spark, sf_dir, "embeddings")
    for probe_id in (0, 7, 42):
        qv = list(emb.filter(F.col("vec_id") == probe_id).first()["embedding"])
        q = emb.filter(F.col("vec_id") == probe_id).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        c = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        exact = [
            r["id"]
            for r in knn.expr_knn_join(q, c, k=5, precision="f64", round_to=6)
            .sort(F.desc("score"), "id").collect()
        ]
        got = [
            int(r["point_id"])
            for r in ann_sink.search_ann_index(
                spark, index_path, qv, k=5, n_probes=8
            ).collect()
        ]
        assert set(got) == set(exact), f"probe {probe_id}: {got} vs {exact}"


def test_probe_limited_search_keeps_self_and_threshold(spark, sf_dir, index_path):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = list(emb.filter(F.col("vec_id") == 5).first()["embedding"])
    hits = ann_sink.search_ann_index(spark, index_path, qv, k=5, n_probes=2).collect()
    assert int(hits[0]["point_id"]) == 5 and abs(hits[0]["score"] - 1.0) < 1e-5
    assert hits[0]["payload"]["label"] is not None
    thr = ann_sink.search_ann_index(
        spark, index_path, qv, k=50, n_probes=2, score_threshold=0.5
    ).collect()
    assert all(r["score"] >= 0.5 for r in thr)


def test_search_prunes_partitions(spark, sf_dir, index_path):
    from penr_oz_agent_memory_rust_spark.plans import explain

    emb = load_table(spark, sf_dir, "embeddings")
    qv = list(emb.filter(F.col("vec_id") == 1).first()["embedding"])
    plan = explain.physical_plan(
        ann_sink.search_ann_index(spark, index_path, qv, k=3, n_probes=2)
    )
    assert "PartitionFilters" in plan
    assert "ivf_cell" in plan.split("PartitionFilters:")[1].splitlines()[0]


def test_upsert_batches_wire_shape(spark, index_path):
    m = ann_sink.read_manifest(index_path)
    total = 0
    seen_cells = set()
    for body in ann_sink.iter_upsert_batches(spark, index_path, batch_size=100):
        assert len(body["points"]) <= 100
        seen_cells.add(body["cell"])
        for p in body["points"]:
            assert set(p) == {"id", "vector", "payload"}
            assert isinstance(p["id"], str) and len(p["vector"]) == m["dim"]
            json.dumps(p)  # wire-serializable
        total += len(body["points"])
    assert total == m["n_points"]
    assert seen_cells == {int(c) for c in m["cells"]}


def test_reserved_text_key_rejected(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings").withColumn("text", F.lit("x"))
    with pytest.raises(ValidationError, match="reserved"):
        ann_sink.write_ann_index(
            emb, str(tmp_path / "bad"), payload_cols=["text"]
        )


def test_text_payload_round_trips(spark, sf_dir, tmp_path):
    """text_col lands in the payload under the reserved key, like the
    reference folds text into the point payload."""
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "text"
    )
    joined = emb.join(docs, "vec_id")
    path = str(tmp_path / "txt_idx")
    ann_sink.write_ann_index(
        emb.join(docs, "vec_id"), path, payload_cols=["label"], text_col="text",
        n_centroids=4, n_iters=2,
    )
    row = ann_sink.spark_read_points(spark, path).first()
    assert "text" in row["payload"] and "label" in row["payload"]
    src = {r["vec_id"]: r["text"] for r in joined.collect()}
    assert row["payload"]["text"] == src[int(row["point_id"])]
