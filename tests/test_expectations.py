"""Expectations validator: one scan, null-as-violation, exact counts."""

from __future__ import annotations

import pytest

from penr_oz_agent_memory_rust_spark.operators.expectations import validate_expectations
from penr_oz_agent_memory_rust_spark.plans import explain


def test_counts_and_null_handling(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None), (None, 5.0)],
        "id bigint, v double",
    )
    out = {
        r["rule"]: (r["n_rows"], r["n_violations"])
        for r in validate_expectations(
            df, {"id_set": "id IS NOT NULL", "v_pos": "v >= 0"}
        ).collect()
    }
    # NULL predicate result (v IS NULL) counts as a violation
    assert out == {"id_set": (4, 1), "v_pos": (4, 2)}


def test_single_scan(spark, sf_dir):
    """All rules fold into one aggregate over one file scan."""
    from penr_oz_agent_memory_rust_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    df = validate_expectations(
        ev, {"a": "value >= 0", "b": "user_id >= 0", "c": "event_id IS NOT NULL"}
    )
    import re

    plan = explain.physical_plan(df)
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) == 1, plan


def test_empty_rules_rejected(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        validate_expectations(df, {})


def test_observe_expectations_rides_on_the_action(spark, tmp_path):
    """The in-flight variant must produce the same numbers as the
    one-scan batch validator, materialized as a side product of an
    unrelated action (here: a parquet write) with no extra job."""
    from penr_oz_agent_memory_rust_spark.operators.expectations import (
        observe_expectations,
        validate_expectations,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None), (4, 250.0)], "id bigint, v double"
    )
    rules = {"v_nonneg": "v >= 0", "v_under_100": "v < 100", "id_notnull": "id IS NOT NULL"}
    observed_df, obs = observe_expectations(df, rules)
    observed_df.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    batch = {
        r["rule"]: r["n_violations"] for r in validate_expectations(df, rules).collect()
    }
    assert got["n_rows"] == 4
    for rule, n in batch.items():
        assert got[f"violations__{rule}"] == n
    assert got["violations__v_nonneg"] == 2  # -1 and NULL both violate


def test_observe_expectations_rejects_empty_rules(spark):
    import pytest as _pytest

    from penr_oz_agent_memory_rust_spark.operators.expectations import observe_expectations

    with _pytest.raises(ValueError):
        observe_expectations(spark.range(1), {})
