"""KNN strategies agree with each other and produce sane plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import knn
from penr_oz_agent_memory_rust_spark.sources.tables import load_table


def sides(spark, sf_dir, n_q=5):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    c = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    return q, c


def test_blocked_matches_expr_strategy(spark, sf_dir):
    """The float32 BLAS path must return the same neighbor IDS as the exact
    f64 expression path (scores differ in ulps; ranking must agree)."""
    q, c = sides(spark, sf_dir)
    expr = knn.expr_knn_join(q, c, k=5, precision="f64")
    blocked = knn.blocked_knn_join(q, c, k=5)
    e = {(r["query_id"], r["id"]) for r in expr.collect()}
    b = {(r["query_id"], r["id"]) for r in blocked.collect()}
    # allow boundary flips from f32-vs-f64 at rank 5: require >= 4/5 overlap per query
    assert len(e & b) >= int(0.8 * len(e)), f"only {len(e & b)}/{len(e)} pairs agree"


def test_expr_knn_returns_k_per_query(spark, sf_dir):
    q, c = sides(spark, sf_dir, n_q=3)
    out = knn.expr_knn_join(q, c, k=4).groupBy("query_id").count().collect()
    assert all(r["count"] == 4 for r in out)


def test_self_is_own_nearest_neighbor(spark, sf_dir):
    q, c = sides(spark, sf_dir, n_q=3)
    top1 = knn.expr_knn_join(q, c, k=1)
    for r in top1.collect():
        assert r["query_id"] == r["id"]
        assert abs(r["score"] - 1.0) < 1e-9


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    """LSH is approximate; with 6 planes recall@5 should still be decent and
    every returned pair must be a true bucket-cohabitant (sanity, not exact)."""
    q, c = sides(spark, sf_dir, n_q=5)
    exact = {(r["query_id"], r["id"]) for r in knn.expr_knn_join(q, c, k=5).collect()}
    approx = {(r["query_id"], r["id"]) for r in knn.lsh_knn_join(q, c, k=5, n_planes=6).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"
    # self-match always lands in its own bucket
    assert all((i, i) in approx for i in range(5))


def test_multiprobe_lsh_beats_single_table(spark, sf_dir):
    """OR-amplification contract: with the same bucket selectivity (planes),
    adding tables can only widen the candidate set, so recall@5 is
    monotonically >= the single-table run — and every single-table hit
    must still be present (table 0 uses a different seed stream, so assert
    on recall, not set containment)."""
    q, c = sides(spark, sf_dir, n_q=8)
    exact = {(r["query_id"], r["id"]) for r in knn.expr_knn_join(q, c, k=5).collect()}
    single = {
        (r["query_id"], r["id"])
        for r in knn.lsh_knn_join(q, c, k=5, n_planes=4).collect()
    }
    multi = {
        (r["query_id"], r["id"])
        for r in knn.lsh_knn_join_multiprobe(q, c, k=5, n_planes=4, n_tables=8).collect()
    }
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    assert r_multi >= r_single, f"multiprobe recall {r_multi} < single {r_single}"
    assert r_multi >= 0.5, f"multiprobe recall collapsed: {r_multi}"
    # self-match survives every table
    assert all((i, i) in multi for i in range(8))


def test_multiprobe_single_table_matches_lsh_knn_join(spark, sf_dir):
    """n_tables=1 with the same seed must reproduce lsh_knn_join exactly —
    the multiprobe path is a strict generalization, not a fork."""
    q, c = sides(spark, sf_dir, n_q=4)
    a = sorted(
        map(tuple, knn.lsh_knn_join(q, c, k=5, n_planes=6).select("query_id", "id").collect())
    )
    b = sorted(
        map(
            tuple,
            knn.lsh_knn_join_multiprobe(q, c, k=5, n_planes=6, n_tables=1)
            .select("query_id", "id")
            .collect(),
        )
    )
    assert a == b


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF with 2 probes over 8 cells should beat LSH-grade recall on
    clustered data; self-match must always survive (own cell is probe #1)."""
    q, c = sides(spark, sf_dir, n_q=5)
    cents = knn.train_ivf_centroids(c, n_centroids=8, n_iters=3)
    assert cents.shape[1] == 64
    exact = {(r["query_id"], r["id"]) for r in knn.expr_knn_join(q, c, k=5).collect()}
    approx = {
        (r["query_id"], r["id"])
        for r in knn.ivf_knn_join(q, c, cents, k=5, n_probes=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"
    assert all((i, i) in approx for i in range(5))


def test_ivf_centroids_deterministic(spark, sf_dir):
    _, c = sides(spark, sf_dir, n_q=1)
    import numpy as np

    c1 = knn.train_ivf_centroids(c, n_centroids=4, n_iters=2)
    c2 = knn.train_ivf_centroids(c, n_centroids=4, n_iters=2)
    assert np.array_equal(c1, c2)


def test_blocked_knn_is_map_in_pandas(spark, sf_dir):
    from penr_oz_agent_memory_rust_spark.plans import explain

    q, c = sides(spark, sf_dir, n_q=2)
    plan = explain.physical_plan(knn.blocked_knn_join(q, c, k=2))
    assert "MapInPandas" in plan


def test_expr_knn_broadcasts_query_side(spark, sf_dir):
    from penr_oz_agent_memory_rust_spark.plans import explain

    q, c = sides(spark, sf_dir, n_q=2)
    plan = explain.physical_plan(knn.expr_knn_join(q, c, k=2))
    assert "Broadcast" in plan


def test_self_join_matches_blocked_strategy(spark, sf_dir):
    """The 2-D block nested loop (no driver collect) must return the same
    neighbor ids as broadcasting the corpus as the query side — both score
    every pair once in f32."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    c = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    q = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    via_broadcast = knn.blocked_knn_join(
        q, c, k=3, query_id="qid", query_vec="qv", corpus_id="id", corpus_vec="vec"
    )
    via_self = knn.blocked_knn_self_join(c, k=3, id_col="id", vec_col="vec")
    b = {(r["qid"], r["id"]) for r in via_broadcast.collect()}
    s = {(r["id_q"], r["id"]) for r in via_self.collect()}
    assert len(b & s) >= int(0.95 * len(b)), f"only {len(b & s)}/{len(b)} pairs agree"
    # every row is its own top-1 neighbor in both
    assert all((i, i) in s for i in range(100))


def test_self_join_plan_has_no_collect_or_broadcast(spark, sf_dir):
    """The self-join must be a pure cogroup plan: FlatMapCoGroupsInPandas,
    no BroadcastExchange anywhere (nothing corpus-sized leaves the executors)."""
    from penr_oz_agent_memory_rust_spark.plans import explain

    _, c = sides(spark, sf_dir, n_q=1)
    plan = explain.physical_plan(knn.blocked_knn_self_join(c, k=2, id_col="id", vec_col="vec"))
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BroadcastExchange" not in plan


def test_blocked_knn_guards_unbounded_query_side(spark, sf_dir):
    """blocked_knn_join is for bounded request batches: an over-limit query
    side must fail fast instead of collecting the corpus to the driver."""
    import pytest

    q, c = sides(spark, sf_dir, n_q=50)
    with pytest.raises(ValueError, match="blocked_knn_self_join"):
        knn.blocked_knn_join(q, c, k=2, max_broadcast_queries=10).collect()


def test_ivf_training_caps_driver_sample(spark, sf_dir):
    """Centroid training must never collect more than max_sample_rows."""
    _, c = sides(spark, sf_dir, n_q=1)
    cents = knn.train_ivf_centroids(c, n_centroids=4, n_iters=2, max_sample_rows=50)
    assert cents.shape == (4, 64)


def test_lsh_signature_expr_matches_udf(spark):
    """The native-expression LSH signature and the Arrow-UDF form are two
    physical strategies for the same function — bit-identical signatures."""
    from penr_oz_agent_memory_rust_spark.operators.knn import (
        _hyperplanes,
        lsh_signature_expr,
        lsh_signature_udf,
    )
    from pyspark.sql import functions as F

    planes = _hyperplanes(dim=4, n_planes=6)
    df = spark.createDataFrame(
        [(i, [float(i), float(-i), 0.5 * i, 1.0]) for i in range(1, 30)],
        "id bigint, vec array<float>",
    )
    out = df.select(
        lsh_signature_expr(F.col("vec"), planes).alias("e"),
        lsh_signature_udf(planes)(F.col("vec")).alias("u"),
    ).collect()
    assert all(r["e"] == r["u"] for r in out)


def test_lsh_self_join_graph(spark, sf_dir):
    """The LSH kNN graph: no self-edges, <= k neighbors per node, decent
    overlap with the exact graph, and self-matches never surface even
    though they always collide."""
    _, c = sides(spark, sf_dir, n_q=1)
    approx = knn.lsh_knn_self_join(
        c, k=3, n_planes=4, n_tables=8, id_col="id", vec_col="vec"
    )
    rows = approx.collect()
    assert all(r["id_a"] != r["id_b"] for r in rows)
    per = {}
    for r in rows:
        per[r["id_a"]] = per.get(r["id_a"], 0) + 1
    assert max(per.values()) <= 3
    # overlap with exact top-3 (excluding self) on a probe subset
    probe = c.filter(F.col("id") < 10).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    exact = knn.expr_knn_join(probe, c, k=4)
    exact_pairs = {
        (r["query_id"], r["id"]) for r in exact.collect() if r["query_id"] != r["id"]
    }
    approx_pairs = {(r["id_a"], r["id_b"]) for r in rows if r["id_a"] < 10}
    recall = len(exact_pairs & approx_pairs) / max(len(exact_pairs), 1)
    assert recall >= 0.3, f"graph recall collapsed: {recall}"


def test_multiprobe_default_recall_floor(spark, sf_dir):
    """The probe-derived defaults (4 planes x 16 tables — PLANS.md "Recall
    probe") must hold a recall floor even on the near-uniform sf vectors,
    the measured worst case. Deterministic: fixed seed, fixed data."""
    q, c = sides(spark, sf_dir, n_q=20)
    exact = {(r["query_id"], r["id"]) for r in knn.expr_knn_join(q, c, k=5).collect()}
    approx = {
        (r["query_id"], r["id"])
        for r in knn.lsh_knn_join_multiprobe(q, c, k=5).collect()  # defaults
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, f"default-parameter recall regressed: {recall}"
