"""Exact quantiles / histogram / quantile-binning / weighted-sampling
operators (operators/stats.py, operators/text_ops.py): semantics pinned
against hand-computed values; determinism pinned by re-running."""

from __future__ import annotations

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import stats
from penr_oz_agent_memory_rust_spark.operators.dedup import ngram_containment_pairs
from penr_oz_agent_memory_rust_spark.operators.text_ops import (
    weighted_bernoulli_sample,
)


def test_exact_group_quantiles_interpolation(spark):
    # group g: [10, 20, 30, 40] -> p50 = 25 (interpolated), p25 = 17.5
    df = spark.createDataFrame(
        [("g", v) for v in (10, 20, 30, 40)] + [("h", 5)], "grp string, x bigint"
    )
    out = {
        (r["grp"], r["p"]): (r["quantile_value"], r["n_values"])
        for r in stats.exact_group_quantiles(df, ["grp"], "x", [0.25, 0.5]).collect()
    }
    assert out[("g", 0.25)] == (17.5, 4)
    assert out[("g", 0.5)] == (25.0, 4)
    assert out[("h", 0.5)] == (5.0, 1)


def test_fixed_width_histogram_bins(spark):
    df = spark.createDataFrame(
        [("a", 0.0), ("a", 19.99), ("a", 20.0), ("b", 45.0), ("a", None)],
        "t string, v double",
    )
    got = {
        (r["t"], r["bin"]): r["n"]
        for r in stats.fixed_width_histogram(df, "v", 20.0, ["t"]).collect()
    }
    assert got == {("a", 0): 2, ("a", 1): 1, ("b", 2): 1}  # nulls dropped


def test_quantile_bucket_stats_no_global_window(spark):
    df = spark.createDataFrame([(v,) for v in range(1, 101)], "x bigint")
    rows = {r["bucket"]: (r["n"], r["mean_value"]) for r in
            stats.quantile_bucket_stats(df, "x", 4).collect()}
    # edges 25.75/50.5/75.25 -> buckets of 25 values each
    assert {b: n for b, (n, _) in rows.items()} == {0: 25, 1: 25, 2: 25, 3: 25}
    assert rows[0][1] == 13.0 and rows[3][1] == 88.0
    # and the plan has no single-partition global window
    plan = stats.quantile_bucket_stats(df, "x", 4)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_weighted_bernoulli_sample_deterministic_and_weighted(spark):
    rows = [(i, (i % 10) + 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "id bigint, w bigint")
    s1 = sorted(r["id"] for r in weighted_bernoulli_sample(df, "id", "w", 200).collect())
    s2 = sorted(r["id"] for r in weighted_bernoulli_sample(df, "id", "w", 200).collect())
    assert s1 == s2 and 100 < len(s1) < 320  # deterministic, near expected k
    # heavier rows survive proportionally more often
    got = spark.createDataFrame([(i,) for i in s1], "id bigint").join(df, "id")
    mean_w_sample = got.agg(F.avg("w")).first()[0]
    mean_w_all = df.agg(F.avg("w")).first()[0]
    assert mean_w_sample > mean_w_all * 1.2
    # zero/negative weights never selected
    z = spark.createDataFrame([(1, 0), (2, 7)], "id bigint, w bigint")
    assert [r["id"] for r in weighted_bernoulli_sample(z, "id", "w", 1).collect()] != [1]


def test_weighted_bernoulli_sample_degenerate_inputs(spark):
    """Empty / all-nonpositive inputs return empty (no None/zero division),
    and Σw counts only weight>0 rows so negative weights don't deflate
    survivors' inclusion probabilities."""
    empty = spark.createDataFrame([], "id bigint, w bigint")
    assert weighted_bernoulli_sample(empty, "id", "w", 10).count() == 0
    nonpos = spark.createDataFrame([(1, 0), (2, -5)], "id bigint, w bigint")
    assert weighted_bernoulli_sample(nonpos, "id", "w", 10).count() == 0
    # a huge negative weight must not shrink the positive rows' Σw:
    # with expected_k=2 and Σw(positive)=2, every positive row has p=1
    mixed = spark.createDataFrame(
        [(1, 1), (2, 1), (3, -1_000_000)], "id bigint, w bigint"
    )
    assert sorted(
        r["id"] for r in weighted_bernoulli_sample(mixed, "id", "w", 2).collect()
    ) == [1, 2]


def test_ngram_containment_directed(spark):
    small = "alpha beta gamma delta epsilon"
    big = small + " zeta eta theta iota kappa lam mu nu xi omicron pi rho sigma"
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, "unrelated words only here nothing shared")],
        "doc_id bigint, text string",
    )
    out = {
        (r["src"], r["dst"]): r["containment"]
        for r in ngram_containment_pairs(df, n=3, threshold=0.3).collect()
    }
    # every 3-shingle of the small doc appears in the big doc
    assert out[(1, 2)] == 1.0
    # the reverse direction is diluted by the big doc's extra shingles
    assert (2, 1) not in out or out[(2, 1)] < 1.0
    assert all(src != 3 and dst != 3 for (src, dst) in out)


def test_project_embeddings_expr_matches_arrow_path(spark):
    import numpy as np

    from penr_oz_agent_memory_rust_spark.operators import projection

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=8).astype("float32")]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    ex = projection.project_embeddings_expr(df, 8, 4, round_dp=6).collect()
    ar = projection.project_embeddings(df, 4).collect()
    ex_m = {r["vec_id"]: r["proj"] for r in ex}
    ar_m = {r["vec_id"]: r["proj"] for r in ar}
    for vid, pe in ex_m.items():
        pa = ar_m[vid]
        assert len(pe) == len(pa) == 4
        # same projection space: f64-fold vs f32-BLAS agree to f32 precision
        assert all(abs(a - b) < 1e-4 for a, b in zip(pe, pa))


def test_exact_group_quantiles_scalable_equals_percentile_path(spark):
    """The bucketed-global-rank form must reproduce the percentile-agg
    form EXACTLY (same quantile_cont interpolation) — including groups
    smaller than a bucket, a constant-valued group, and n=1."""
    import random

    rng = random.Random(11)
    rows = (
        [("a", rng.randint(0, 10_000)) for _ in range(3000)]
        + [("b", rng.randint(0, 50)) for _ in range(37)]
        + [("c", 7) for _ in range(10)]
        + [("d", 42)]
    )
    df = spark.createDataFrame(rows, "grp string, x bigint")
    probs = [0.25, 0.5, 0.75, 0.9]
    a = {
        (r["grp"], r["p"]): (r["quantile_value"], r["n_values"])
        for r in stats.exact_group_quantiles(df, ["grp"], "x", probs).collect()
    }
    b = {
        (r["grp"], r["p"]): (r["quantile_value"], r["n_values"])
        for r in stats.exact_group_quantiles_scalable(
            df, ["grp"], "x", probs, n_buckets=16
        ).collect()
    }
    assert a == b
    # and no per-group value buffering: the only window sorts WITHIN a
    # (group, bucket) cell
    plan = (
        stats.exact_group_quantiles_scalable(df, ["grp"], "x", probs, n_buckets=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "percentile" not in plan.lower()
