from __future__ import annotations

import math

import pytest

from penr_oz_agent_memory_rust_spark.operators import drift


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "value double")


def test_identical_distributions_zero_psi(spark):
    xs = list(range(100))
    bins = drift.psi_bins(_vals(spark, xs), _vals(spark, xs), n_bins=10)
    total = drift.psi_total(bins).collect()[0]["psi"]
    assert total == pytest.approx(0.0, abs=1e-9)


def test_hand_computed_two_bins(spark):
    # baseline: 50/50 across [0,1) and [1,2); current: 80/20
    base = [0.5] * 5 + [1.5] * 5
    cur = [0.5] * 8 + [1.5] * 2
    bins = drift.psi_bins(_vals(spark, base), _vals(spark, cur), n_bins=2)
    rows = {r["bin"]: r for r in bins.collect()}
    assert rows[0]["e_pct"] == 0.5 and rows[0]["a_pct"] == 0.8
    want0 = (0.8 - 0.5) * math.log(0.8 / 0.5)
    want1 = (0.2 - 0.5) * math.log(0.2 / 0.5)
    assert rows[0]["term"] == pytest.approx(want0, abs=1e-6)
    assert rows[1]["term"] == pytest.approx(want1, abs=1e-6)
    total = drift.psi_total(bins).collect()[0]["psi"]
    assert total == pytest.approx(want0 + want1, abs=1e-6)
    assert total > 0.25  # "action" territory


def test_out_of_range_current_clamps_to_edge_bins(spark):
    base = [float(x) for x in range(10)]  # range [0, 9]
    cur = [-100.0, 100.0]
    bins = {r["bin"]: r for r in drift.psi_bins(_vals(spark, base), _vals(spark, cur), n_bins=5).collect()}
    assert bins[0]["a_pct"] == 0.5 and bins[4]["a_pct"] == 0.5


def test_empty_bin_floored_not_nan(spark):
    base = [0.0, 10.0]  # only edge bins populated
    cur = [0.0, 10.0]
    rows = drift.psi_bins(_vals(spark, base), _vals(spark, cur), n_bins=10).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["term"] is not None and not math.isnan(r["term"])


def test_all_bins_present_even_when_empty(spark):
    bins = drift.psi_bins(_vals(spark, [1.0, 2.0]), _vals(spark, [1.5]), n_bins=7)
    assert sorted(r["bin"] for r in bins.collect()) == list(range(7))


def test_no_python_in_plan(spark):
    from penr_oz_agent_memory_rust_spark.plans import explain

    df = drift.psi_bins(_vals(spark, [1.0, 2.0]), _vals(spark, [1.5]))
    plan = explain.physical_plan(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
