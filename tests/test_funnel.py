"""Funnel semantics: ordering is strict, horizon binds to the funnel
start, counts are non-increasing."""

from __future__ import annotations

import datetime as dt

from penr_oz_agent_memory_rust_spark.operators import funnel


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def make_events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp"
    )


def test_funnel_strict_order_and_horizon(spark):
    ev = make_events(
        spark,
        [
            # u1 completes A->B->C in order
            (1, "A", ts(1)), (1, "B", ts(2)), (1, "C", ts(3)),
            # u2 does B BEFORE A: B must not count
            (2, "B", ts(1)), (2, "A", ts(2)),
            # u3 completes but C outside the 3h horizon from t0
            (3, "A", ts(1)), (3, "B", ts(2)), (3, "C", ts(9)),
            # u4 never starts
            (4, "B", ts(1)), (4, "C", ts(2)),
        ],
    )
    out = {
        r["step"]: r["n_users"]
        for r in funnel.funnel_conversion(
            ev, ["A", "B", "C"], within_seconds=3 * 3600
        ).collect()
    }
    assert out == {"A": 3, "B": 2, "C": 1}


def test_funnel_uses_earliest_completion(spark):
    """First-touch semantics: u1's earliest B is before its A, but a later
    B exists — the funnel must use the earliest B AFTER t0."""
    ev = make_events(
        spark,
        [(1, "B", ts(1)), (1, "A", ts(2)), (1, "B", ts(4)), (1, "C", ts(5))],
    )
    out = {
        r["step"]: r["n_users"]
        for r in funnel.funnel_conversion(ev, ["A", "B", "C"]).collect()
    }
    assert out == {"A": 1, "B": 1, "C": 1}
    times = funnel.funnel_user_times(ev, ["A", "B", "C"]).first()
    assert times["t1"] == ts(4)


def test_funnel_counts_non_increasing(spark, sf_dir):
    from penr_oz_agent_memory_rust_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = sorted(
        funnel.funnel_conversion(
            ev, ["signup", "click", "purchase"], within_seconds=7200
        ).collect(),
        key=lambda r: r["step_idx"],
    )
    ns = [r["n_users"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert ns[0] > 0
