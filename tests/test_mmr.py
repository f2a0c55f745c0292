"""MMR re-rank: lam=1 equals relevance order, duplicates get demoted at
lam<1, determinism, bounded-collect guard, empty input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import mmr
from penr_oz_agent_memory_rust_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def cands(spark):
    # id 1 and 2 are EXACT duplicates, both highly relevant to q=[1,0];
    # id 3 is orthogonal-but-somewhat-relevant; id 4 is anti-relevant
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [0.6, 0.8]),
        (4, [-1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_lam1_is_relevance_order(cands):
    got = [r["vec_id"] for r in mmr.mmr_select(cands, [1.0, 0.0], k=4, lam=1.0).collect()]
    assert got == [1, 2, 3, 4]


def test_duplicates_demoted(cands):
    got = [r["vec_id"] for r in mmr.mmr_select(cands, [1.0, 0.0], k=3, lam=0.4).collect()]
    # after picking 1: duplicate 2 scores .4*1-.6*1 = -0.2; diverse 3
    # scores .4*.6-.6*.6 = -0.12 and wins; anti-relevant 4 scores
    # .4*(-1)-.6*0 = -0.4 (redundancy clamped at 0) and never enters
    assert got == [1, 3, 2]


def test_deterministic(cands):
    a = [tuple(r) for r in mmr.mmr_select(cands, [1.0, 0.0], k=4, lam=0.7).collect()]
    b = [tuple(r) for r in mmr.mmr_select(cands, [1.0, 0.0], k=4, lam=0.7).collect()]
    assert a == b


def test_guard_rejects_unbounded_input(spark):
    big = spark.range(11_000).select(
        F.col("id").alias("vec_id"), F.array(F.lit(1.0), F.lit(0.0)).alias("embedding")
    )
    with pytest.raises(ValueError, match="max_candidates"):
        mmr.mmr_select(big, [1.0, 0.0], k=5)


def test_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    assert mmr.mmr_select(empty, [1.0, 0.0], k=5).count() == 0


def test_on_real_candidates(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    cands = emb.filter(F.col("vec_id") < 100)
    out = mmr.mmr_select(cands, qv, k=10, lam=0.7).collect()
    assert len(out) == 10
    assert out[0]["vec_id"] == 0  # self is most relevant and first pick
    assert [r["rank"] for r in out] == list(range(1, 11))
