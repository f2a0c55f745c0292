"""Time-series regularization: resample/gap_fill/interpolate invariants on
hand-built series, plus the mutual-kNN edge filter."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import timeseries
from penr_oz_agent_memory_rust_spark.operators.knn import mutual_knn_filter


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, ts timestamp, value double")


def test_resample_buckets_and_counts(spark):
    df = _series(
        spark,
        [
            ("a", datetime(2024, 1, 1, 0, 0, 5), 1.0),
            ("a", datetime(2024, 1, 1, 0, 0, 55), 3.0),
            ("a", datetime(2024, 1, 1, 0, 2, 0), 10.0),
        ],
    )
    obs = {r["bucket"]: r for r in timeseries.resample(df, ["k"], "ts", "value", 60).collect()}
    t0 = int(datetime(2024, 1, 1).timestamp())
    assert obs[t0]["v"] == 2.0 and obs[t0]["n_obs"] == 2
    assert obs[t0 + 120]["v"] == 10.0 and obs[t0 + 120]["n_obs"] == 1
    assert t0 + 60 not in obs  # resample alone leaves gaps


def test_gap_fill_densifies_per_key_range(spark):
    df = _series(
        spark,
        [
            ("a", datetime(2024, 1, 1, 0, 0), 1.0),
            ("a", datetime(2024, 1, 1, 0, 4), 5.0),
            ("b", datetime(2024, 1, 1, 0, 1), 7.0),
        ],
    )
    obs = timeseries.resample(df, ["k"], "ts", "value", 60)
    dense = timeseries.gap_fill(obs, ["k"], 60)
    a = dense.filter(F.col("k") == "a").orderBy("bucket").collect()
    assert len(a) == 5  # 0..4 minutes inclusive
    assert [r["n_obs"] for r in a] == [1, 0, 0, 0, 1]
    assert dense.filter(F.col("k") == "b").count() == 1  # single-point series


def test_linear_interpolation_exact_midpoints(spark):
    df = _series(
        spark,
        [
            ("a", datetime(2024, 1, 1, 0, 0), 1.0),
            ("a", datetime(2024, 1, 1, 0, 4), 9.0),
        ],
    )
    obs = timeseries.resample(df, ["k"], "ts", "value", 60)
    out = (
        timeseries.interpolate(timeseries.gap_fill(obs, ["k"], 60), ["k"])
        .orderBy("bucket")
        .collect()
    )
    assert [r["value_filled"] for r in out] == [1.0, 3.0, 5.0, 7.0, 9.0]
    assert [r["is_gap"] for r in out] == [False, True, True, True, False]


def test_locf_and_edge_backfill(spark):
    df = _series(
        spark,
        [
            ("a", datetime(2024, 1, 1, 0, 1), 4.0),
            ("a", datetime(2024, 1, 1, 0, 3), 8.0),
        ],
    )
    obs = timeseries.resample(df, ["k"], "ts", "value", 60)
    dense = timeseries.gap_fill(obs, ["k"], 60)
    locf = [
        r["value_filled"]
        for r in timeseries.interpolate(dense, ["k"], method="locf").orderBy("bucket").collect()
    ]
    assert locf == [4.0, 4.0, 8.0]  # gap carries forward
    # leading gap (before the first obs) backfills from the next one
    df2 = _series(
        spark,
        [
            ("a", datetime(2024, 1, 1, 0, 0), 2.0),
            ("a", datetime(2024, 1, 1, 0, 2), 6.0),
        ],
    )
    obs2 = timeseries.resample(df2.filter(F.col("value") > 0), ["k"], "ts", "value", 60)
    out2 = timeseries.interpolate(timeseries.gap_fill(obs2, ["k"], 60), ["k"], method="locf")
    assert [r["value_filled"] for r in out2.orderBy("bucket").collect()] == [2.0, 2.0, 6.0]


def test_mutual_filter_keeps_only_reciprocal_pairs(spark):
    edges = spark.createDataFrame(
        [
            (1, 2, 0.9),  # reciprocal with (2,1)
            (2, 1, 0.9),
            (1, 3, 0.8),  # one-directional: 3 never points back
            (3, 4, 0.7),
            (4, 3, 0.7),
            (5, 5, 1.0),  # self-edge must not survive
        ],
        "query_id bigint, id bigint, score double",
    )
    got = sorted((r["u"], r["v"]) for r in mutual_knn_filter(edges).collect())
    assert got == [(1, 2), (3, 4)]


def test_rolling_stats_window_and_rampup(spark):
    rows = [("a", i, float(v)) for i, v in enumerate([2, 4, 6, 100])]
    df = spark.createDataFrame(rows, "k string, bucket bigint, v double")
    out = {r["bucket"]: r for r in timeseries.rolling(df, ["k"], "bucket", "v", window_rows=3).collect()}
    assert out[0]["roll_n"] == 1 and out[0]["roll_std"] is None
    assert out[1]["roll_mean"] == 3.0 and out[1]["roll_median"] == 3.0
    assert out[2]["roll_mean"] == 4.0 and out[2]["roll_median"] == 4.0
    # trailing window drops bucket 0: median of (4, 6, 100) resists the spike
    assert out[3]["roll_median"] == 6.0
    assert out[3]["roll_mean"] == round((4 + 6 + 100) / 3, 6)
    assert out[3]["roll_n"] == 3


def test_fused_gapfill_interp_equals_two_step(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 0, 0), 1.0),
        ("a", datetime(2024, 1, 1, 0, 3), 7.0),
        ("a", datetime(2024, 1, 1, 0, 5), 3.0),
        ("b", datetime(2024, 1, 1, 0, 2), 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    obs = timeseries.resample(df, ["k"], "ts", "value", 60)
    cols = ["k", "bucket", "value_filled", "is_gap", "n_obs"]
    two_step = (
        timeseries.interpolate(timeseries.gap_fill(obs, ["k"], 60), ["k"])
        .select(*cols).orderBy("k", "bucket").collect()
    )
    fused = (
        timeseries.gap_fill_interpolate(obs, ["k"], 60)
        .select(*cols).orderBy("k", "bucket").collect()
    )
    assert [tuple(r) for r in fused] == [tuple(r) for r in two_step]
    # locf variant agrees too
    two_locf = (
        timeseries.interpolate(timeseries.gap_fill(obs, ["k"], 60), ["k"], method="locf")
        .select(*cols).orderBy("k", "bucket").collect()
    )
    fused_locf = (
        timeseries.gap_fill_interpolate(obs, ["k"], 60, method="locf")
        .select(*cols).orderBy("k", "bucket").collect()
    )
    assert [tuple(r) for r in fused_locf] == [tuple(r) for r in two_locf]
