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


def test_asof_forward_picks_earliest_at_or_after(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "e1"), (1, ts(5), "e2"), (2, ts(30), "e3")],
        "k bigint, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, ts(4), 100, 1.0),   # before both: never forward-eligible
            (1, ts(5), 101, 2.0),   # equal time: eligible (>=) for e2
            (1, ts(12), 102, 3.0),
            (2, ts(20), 200, 9.0),  # before e3: not eligible
        ],
        "k bigint, rt timestamp, rid bigint, val double",
    )
    out = {
        r["name"]: (r["rid"], r["val"])
        for r in asof_join(
            left, right, key="k", left_time="t", right_time="rt",
            right_cols=["rid", "val"], tiebreak="rid", direction="forward",
        ).collect()
    }
    assert out["e1"] == (102, 3.0)   # earliest at-or-after t=10
    assert out["e2"] == (101, 2.0)   # equal-time row eligible
    assert out["e3"] == (None, None)  # only past rows


def test_asof_forward_tolerance_and_tiebreak(spark):
    left = spark.createDataFrame([(1, ts(10), "e")], "k bigint, t timestamp, name string")
    right = spark.createDataFrame(
        [(1, ts(40), 7, 1.0), (1, ts(40), 9, 2.0)],
        "k bigint, rt timestamp, rid bigint, val double",
    )
    hit = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        right_cols=["rid", "val"], tiebreak="rid", direction="forward",
        tolerance_seconds=30,
    ).first()
    assert hit["rid"] == 9  # larger tiebreak wins in both directions
    stale = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        right_cols=["rid", "val"], tiebreak="rid", direction="forward",
        tolerance_seconds=29,
    ).first()
    assert stale["rid"] is None


def test_asof_nearest_distance_and_backward_ties(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "near_fwd"), (1, ts(20), "near_bwd"), (1, ts(31), "tie")],
        "k bigint, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, ts(2), 1, 1.0), (1, ts(13), 2, 2.0), (1, ts(49), 3, 3.0)],
        "k bigint, rt timestamp, rid bigint, val double",
    )
    out = {
        r["name"]: r["rid"]
        for r in asof_join(
            left, right, key="k", left_time="t", right_time="rt",
            right_cols=["rid", "val"], tiebreak="rid", direction="nearest",
        ).collect()
    }
    assert out["near_fwd"] == 2  # 13 is 3 away, 2 is 8 away
    assert out["near_bwd"] == 2  # 13 is 7 away, 49 is 29 away
    assert out["tie"] == 2       # 18 back vs 18 forward: backward wins


def test_asof_rejects_bad_direction(spark):
    import pytest

    left = spark.createDataFrame([(1, ts(1), "e")], "k bigint, t timestamp, name string")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left, key="k", left_time="t", right_time="t",
                  right_cols=["name"], direction="sideways")


def test_asof_strict_excludes_exact_matches(spark):
    left = spark.createDataFrame([(1, ts(10), "e")], "k bigint, t timestamp, name string")
    right = spark.createDataFrame(
        [(1, ts(10), 5, 1.0), (1, ts(8), 4, 2.0), (1, ts(12), 6, 3.0)],
        "k bigint, rt timestamp, rid bigint, val double",
    )
    kw = dict(key="k", left_time="t", right_time="rt",
              right_cols=["rid", "val"], tiebreak="rid")
    assert asof_join(left, right, **kw).first()["rid"] == 5  # inclusive
    strict_b = asof_join(left, right, allow_exact_matches=False, **kw).first()
    assert strict_b["rid"] == 4  # equal-time row skipped, strictly before
    strict_f = asof_join(
        left, right, direction="forward", allow_exact_matches=False, **kw
    ).first()
    assert strict_f["rid"] == 6  # strictly after


def test_asof_multi_column_by_keys(spark):
    left = spark.createDataFrame(
        [(1, "x", ts(10), "a"), (1, "y", ts(10), "b")],
        "k1 bigint, k2 string, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, "x", ts(5), 100, 1.0), (1, "y", ts(6), 200, 2.0)],
        "k1 bigint, k2 string, rt timestamp, rid bigint, val double",
    )
    out = {
        r["name"]: r["rid"]
        for r in asof_join(
            left, right, key=["k1", "k2"], left_time="t", right_time="rt",
            right_cols=["rid", "val"], tiebreak="rid",
        ).collect()
    }
    assert out == {"a": 100, "b": 200}  # never crosses the (k1,k2) group


def test_asof_global_byless_matches_pandas_all_directions(spark):
    """key=None (pandas merge_asof without `by`): one global time order.
    Randomized series with exact ties, checked against pandas merge_asof
    for backward / forward / nearest."""
    import numpy as np
    import pandas as pd

    rng = np.random.Generator(np.random.PCG64(11))
    base = dt.datetime(2026, 1, 1)
    left_rows = [
        (base + dt.timedelta(seconds=int(rng.integers(0, 300))), i)
        for i in range(90)
    ]
    # DISTINCT right times: pandas breaks exact right-time ties by input
    # order while our contract picks the largest tiebreak (pinned in
    # test_asof_forward_tolerance_and_tiebreak) — the property here is
    # the direction semantics over interleavings and left==right times
    right_secs = rng.permutation(np.arange(0, 300, 3))[:60]
    right_rows = [
        (base + dt.timedelta(seconds=int(s)), i, float(i))
        for i, s in enumerate(right_secs)
    ]
    left = spark.createDataFrame(left_rows, "t timestamp, lid bigint")
    right = spark.createDataFrame(right_rows, "rt timestamp, rid bigint, val double")
    lpdf = pd.DataFrame(left_rows, columns=["t", "lid"]).sort_values(
        "t", kind="stable"
    )
    # presort right by (rt, rid): merge_asof keeps the last tie, our
    # contract the largest tiebreak — identical after this sort
    rpdf = pd.DataFrame(right_rows, columns=["rt", "rid", "val"]).sort_values(
        ["rt", "rid"], kind="stable"
    )
    for direction in ("backward", "forward", "nearest"):
        got = {
            r["lid"]: r["val"]
            for r in asof_join(
                left, right, key=None, left_time="t", right_time="rt",
                right_cols=["rid", "val"], tiebreak="rid", direction=direction,
            ).collect()
        }
        exp_df = pd.merge_asof(
            lpdf, rpdf, left_on="t", right_on="rt", direction=direction
        )
        exp = {
            int(r.lid): (None if pd.isna(r.val) else float(r.val))
            for r in exp_df.itertuples()
        }
        assert got == exp, direction


def test_asof_global_size_guard(spark):
    import pytest

    left = spark.createDataFrame(
        [(ts(i), i) for i in range(10)], "t timestamp, lid bigint"
    )
    right = spark.createDataFrame(
        [(ts(i), i, float(i)) for i in range(10)], "rt timestamp, rid bigint, val double"
    )
    with pytest.raises(ValueError, match="global_max_rows"):
        asof_join(
            left, right, key=None, left_time="t", right_time="rt",
            right_cols=["val"], global_max_rows=5,
        )
