from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import ranking_metrics


def _run(spark, rows):
    return spark.createDataFrame(rows, "qid int, doc_id int, rank int")


def _qrels(spark, rows):
    return spark.createDataFrame(rows, "qid int, doc_id int, rel int")


def _dcg(grades_by_pos):
    return sum((2.0**g - 1.0) / math.log2(p + 1) for p, g in grades_by_pos)


def test_hand_computed_binary(spark):
    # q1: 3 relevant total, hits at ranks 1 and 3 within k=5
    run = _run(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4), (1, 14, 5)])
    qrels = _qrels(spark, [(1, 10, 1), (1, 12, 1), (1, 99, 1), (1, 11, 0)])
    out = ranking_metrics.retrieval_metrics(run, qrels, k=5).collect()[0]
    assert out["n_rel"] == 3 and out["n_hits"] == 2
    assert out["precision_at_k"] == pytest.approx(2 / 5)
    assert out["recall_at_k"] == pytest.approx(2 / 3)
    assert out["rr"] == pytest.approx(1.0)
    dcg = _dcg([(1, 1), (3, 1)])
    idcg = _dcg([(1, 1), (2, 1), (3, 1)])
    assert out["dcg_at_k"] == pytest.approx(dcg, abs=1e-6)
    assert out["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-6)


def test_graded_idcg_matches_sorted_bruteforce(spark):
    # grades {3:1 doc, 2:2 docs, 1:4 docs}; k=5 truncates inside grade 1
    qrels = _qrels(
        spark,
        [(7, d, g) for d, g in [(1, 3), (2, 2), (3, 2), (4, 1), (5, 1), (6, 1), (8, 1)]],
    )
    got = ranking_metrics.ideal_dcg(qrels, k=5).collect()[0]
    grades = sorted([3, 2, 2, 1, 1, 1, 1], reverse=True)[:5]
    want = _dcg(list(enumerate(grades, start=1)))
    assert got["n_rel"] == 7
    assert got["__idcg"] == pytest.approx(want, abs=1e-9)


def test_zero_hit_query_gets_zero_row(spark):
    run = _run(spark, [(1, 10, 1), (2, 20, 1)])
    qrels = _qrels(spark, [(1, 10, 1), (2, 99, 1)])
    rows = {r["qid"]: r for r in ranking_metrics.retrieval_metrics(run, qrels, k=5).collect()}
    assert rows[2]["n_hits"] == 0
    assert rows[2]["recall_at_k"] == 0.0
    assert rows[2]["rr"] == 0.0
    assert rows[2]["ndcg_at_k"] == 0.0
    assert rows[1]["n_hits"] == 1


def test_unjudged_query_excluded(spark):
    run = _run(spark, [(1, 10, 1), (5, 50, 1)])
    qrels = _qrels(spark, [(1, 10, 1)])
    qids = [r["qid"] for r in ranking_metrics.retrieval_metrics(run, qrels, k=5).collect()]
    assert qids == [1]


def test_hits_beyond_k_ignored(spark):
    run = _run(spark, [(1, 10, 1), (1, 11, 6)])
    qrels = _qrels(spark, [(1, 10, 1), (1, 11, 1)])
    out = ranking_metrics.retrieval_metrics(run, qrels, k=5).collect()[0]
    assert out["n_hits"] == 1


def test_macro_metrics(spark):
    run = _run(spark, [(1, 10, 1), (2, 20, 2)])
    qrels = _qrels(spark, [(1, 10, 1), (2, 20, 1), (2, 21, 1)])
    per_q = ranking_metrics.retrieval_metrics(run, qrels, k=5)
    m = ranking_metrics.macro_metrics(per_q).collect()[0]
    assert m["n_queries"] == 2
    assert m["mrr"] == pytest.approx((1.0 + 0.5) / 2)
    assert m["macro_recall_at_k"] == pytest.approx((1.0 + 0.5) / 2)


def test_no_global_shuffle_window(spark):
    """The only window in the plan partitions by query — no empty
    partitionBy (global sort) may appear."""
    run = _run(spark, [(1, 10, 1)])
    qrels = _qrels(spark, [(1, 10, 1)])
    plan = ranking_metrics.retrieval_metrics(run, qrels, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "partial" in plan.lower() or "HashAggregate" in plan
