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
