"""Binned interval join: equivalence with the naive theta join, endpoint
inclusivity, multi-bin intervals, and no-duplicate guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import rangejoin


def _collect_pairs(df):
    return sorted((r["pid"], r["iid"]) for r in df.collect())


@pytest.fixture()
def points(spark):
    rows = [(i, i % 3, (i * 37) % 1000) for i in range(60)]
    return spark.createDataFrame(rows, "pid bigint, k bigint, ts bigint")


@pytest.fixture()
def intervals(spark):
    rows = [
        (100 + j, j % 3, (j * 113) % 900, (j * 113) % 900 + 50 + 40 * (j % 4))
        for j in range(20)
    ]
    return spark.createDataFrame(rows, "iid bigint, k bigint, lo bigint, hi bigint")


@pytest.mark.parametrize("bin_width", [10, 64, 1000])
def test_matches_naive_theta_join(spark, points, intervals, bin_width):
    """Same pairs as the unbinned range join at any bin width."""
    got = rangejoin.interval_join(
        points, intervals, key="k", left_ts="ts",
        right_start="lo", right_end="hi", bin_width=bin_width,
    )
    naive = points.join(
        intervals,
        (points["k"] == intervals["k"])
        & (points["ts"] >= intervals["lo"])
        & (points["ts"] <= intervals["hi"]),
    ).select(points["pid"], intervals["iid"])
    assert _collect_pairs(got.select("pid", "iid")) == _collect_pairs(naive)
    # one output row per qualifying (point, interval) pair — never duplicated
    pairs = _collect_pairs(got.select("pid", "iid"))
    assert len(pairs) == len(set(pairs))
    assert len(pairs) > 0


def test_endpoints_inclusive(spark):
    pts = spark.createDataFrame(
        [(1, 0, 100), (2, 0, 200), (3, 0, 99), (4, 0, 201)],
        "pid bigint, k bigint, ts bigint",
    )
    iv = spark.createDataFrame([(9, 0, 100, 200)], "iid bigint, k bigint, lo bigint, hi bigint")
    got = rangejoin.interval_join(
        pts, iv, key="k", left_ts="ts", right_start="lo", right_end="hi", bin_width=7
    )
    assert _collect_pairs(got.select("pid", "iid")) == [(1, 9), (2, 9)]


def test_interval_spanning_many_bins(spark):
    """An interval covering many bins still matches each point exactly once."""
    pts = spark.createDataFrame(
        [(i, 0, i * 10) for i in range(50)], "pid bigint, k bigint, ts bigint"
    )
    iv = spark.createDataFrame([(7, 0, 0, 490)], "iid bigint, k bigint, lo bigint, hi bigint")
    got = rangejoin.interval_join(
        pts, iv, key="k", left_ts="ts", right_start="lo", right_end="hi", bin_width=25
    )
    pairs = _collect_pairs(got.select("pid", "iid"))
    assert pairs == [(i, 7) for i in range(50)]


def test_key_mismatch_never_joins(spark):
    pts = spark.createDataFrame([(1, 1, 100)], "pid bigint, k bigint, ts bigint")
    iv = spark.createDataFrame([(9, 2, 0, 1000)], "iid bigint, k bigint, lo bigint, hi bigint")
    got = rangejoin.interval_join(
        pts, iv, key="k", left_ts="ts", right_start="lo", right_end="hi", bin_width=100
    )
    assert got.count() == 0


def test_output_columns(spark, points, intervals):
    got = rangejoin.interval_join(
        points, intervals, key="k", left_ts="ts",
        right_start="lo", right_end="hi", bin_width=100,
    )
    assert got.columns == ["pid", "k", "ts", "iid", "lo", "hi"]
