"""Preference-pair construction: argmax/argmin, ties, margin, no window."""

from __future__ import annotations

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators.preference import preference_pairs
from penr_oz_agent_memory_rust_spark.plans import explain


def _scored(spark):
    return spark.createDataFrame(
        [
            ("a", 1, 0.9), ("a", 2, 0.1), ("a", 3, 0.5),
            ("b", 4, 0.625), ("b", 5, 0.5),  # gap exactly 0.125 (dyadic:
            # 0.6-0.55 would float to 0.04999... and flake the margin)
            ("c", 6, 0.7),                    # singleton: no pair
            ("d", 7, 0.4), ("d", 8, 0.4),    # exact tie: gap 0
        ],
        "grp string, doc_id bigint, q double",
    )


def test_pairs_pick_best_vs_worst_with_margin(spark):
    out = {r["grp"]: r for r in preference_pairs(_scored(spark), "grp", "doc_id", "q", 0.05).collect()}
    assert set(out) == {"a", "b"}
    assert (out["a"]["chosen_id"], out["a"]["rejected_id"]) == (1, 2)
    assert (out["b"]["chosen_id"], out["b"]["rejected_id"]) == (4, 5)
    assert out["a"]["gap"] == 0.8
    assert out["b"]["gap"] == 0.125


def test_tie_groups_and_singletons_dropped(spark):
    out = {r["grp"] for r in preference_pairs(_scored(spark), "grp", "doc_id", "q", 0.0).collect()}
    # margin 0: the exact-tie group d passes the gap filter, but chosen
    # and rejected both tiebreak to the SAME smallest id (7), so the
    # no-self-pair guard drops it
    assert "c" not in out
    assert "d" not in out


def test_tie_resolution_is_smallest_id(spark):
    df = spark.createDataFrame(
        [("g", 9, 0.9), ("g", 3, 0.9), ("g", 5, 0.1), ("g", 2, 0.1)],
        "grp string, doc_id bigint, q double",
    )
    r = preference_pairs(df, "grp", "doc_id", "q").first()
    assert r["chosen_id"] == 3 and r["rejected_id"] == 2


def test_plan_single_agg_no_window(spark):
    df = preference_pairs(_scored(spark), "grp", "doc_id", "q", 0.05)
    plan = explain.physical_plan(df)
    assert "windowspecdefinition" not in plan
    assert explain.count_shuffle_exchanges(df) == 1
