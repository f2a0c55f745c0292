"""As-of join semantics on hand-built series."""

from __future__ import annotations

import datetime as dt

from penr_oz_agent_memory_rust_spark.operators.asof import asof_join


def ts(i):
    return dt.datetime(2026, 1, 1, 0, 0, i)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "e1"), (1, ts(5), "e2"), (2, ts(10), "e3"), (3, ts(10), "e4")],
        "k bigint, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, ts(4), 100, 1.0),
            (1, ts(5), 101, 2.0),   # equal time: eligible (<=)
            (1, ts(6), 102, 3.0),
            (2, ts(20), 200, 9.0),  # after e3: not eligible
        ],
        "k bigint, rt timestamp, rid bigint, val double",
    )
    out = {
        r["name"]: (r["rid"], r["val"])
        for r in asof_join(
            left, right, key="k", left_time="t", right_time="rt",
            right_cols=["rid", "val"], tiebreak="rid",
        ).collect()
    }
    assert out["e1"] == (102, 3.0)   # latest before t=10
    assert out["e2"] == (101, 2.0)   # equal-time row eligible
    assert out["e3"] == (None, None)  # only future rows
    assert out["e4"] == (None, None)  # key never on right


def test_asof_tiebreak_largest_wins(spark):
    left = spark.createDataFrame([(1, ts(10), "e")], "k bigint, t timestamp, name string")
    right = spark.createDataFrame(
        [(1, ts(3), 7, 1.0), (1, ts(3), 9, 2.0), (1, ts(3), 8, 3.0)],
        "k bigint, rt timestamp, rid bigint, val double",
    )
    row = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        right_cols=["rid", "val"], tiebreak="rid",
    ).first()
    assert row["rid"] == 9 and row["val"] == 2.0


def test_asof_inner_drops_unmatched(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "hit"), (2, ts(10), "miss")], "k bigint, t timestamp, name string"
    )
    right = spark.createDataFrame([(1, ts(1), 5, 0.0)], "k bigint, rt timestamp, rid bigint, val double")
    out = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        right_cols=["rid", "val"], keep_unmatched=False,
    ).collect()
    assert [r["name"] for r in out] == ["hit"]


def test_asof_single_shuffle(spark):
    """The union-sort plan shuffles once on the key — no range-join blowup."""
    from penr_oz_agent_memory_rust_spark.plans import explain

    left = spark.createDataFrame([(1, ts(1), "x")], "k bigint, t timestamp, name string")
    right = spark.createDataFrame([(1, ts(0), 1, 0.0)], "k bigint, rt timestamp, rid bigint, val double")
    df = asof_join(left, right, key="k", left_time="t", right_time="rt", right_cols=["rid", "val"])
    assert explain.count_shuffle_exchanges(df) == 1


def test_asof_tolerance_nulls_stale_matches(spark):
    base = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame(
        [
            (1, base + dt.timedelta(seconds=100), "fresh"),
            (1, base + dt.timedelta(seconds=5000), "stale"),
        ],
        "k bigint, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=50), 7, 1.5)],
        "k bigint, rt timestamp, rid bigint, val double",
    )
    out = {
        r["name"]: r["rid"]
        for r in asof_join(
            left, right, key="k", left_time="t", right_time="rt",
            right_cols=["rid", "val"], tolerance_seconds=1000,
        ).collect()
    }
    assert out["fresh"] == 7 and out["stale"] is None


def test_asof_tolerance_inner_drops_stale(spark):
    base = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame(
        [
            (1, base + dt.timedelta(seconds=100), "fresh"),
            (1, base + dt.timedelta(seconds=5000), "stale"),
        ],
        "k bigint, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=50), 7, 1.5)],
        "k bigint, rt timestamp, rid bigint, val double",
    )
    out = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        right_cols=["rid", "val"], tolerance_seconds=1000, keep_unmatched=False,
    ).collect()
    assert [r["name"] for r in out] == ["fresh"]
