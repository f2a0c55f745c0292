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


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_id bigint, event_type string, value double")


def test_mad_outliers_flags_only_the_gross_outlier(spark):
    # bulk tightly packed around 10; one point far out; one mildly off
    rows = [(i, "a", 10.0 + (i % 5) * 0.1) for i in range(20)]
    rows += [(100, "a", 500.0), (101, "a", 10.5)]
    out = drift.mad_outliers(_events(spark, rows), group_col="event_type").collect()
    assert [r["event_id"] for r in out] == [100]
    r = out[0]
    # median of bulk ~10.2, MAD ~0.1 -> |z| enormous
    assert abs(r["robust_z"]) > 100
    assert r["event_type"] == "a" and r["value"] == 500.0


def test_mad_outliers_zero_mad_group_excluded(spark):
    # constant group: MAD = 0 -> no division, no rows emitted even for the
    # deviant (the robust score is undefined there, not infinite)
    rows = [(i, "c", 5.0) for i in range(10)] + [(99, "c", 1000.0)]
    out = drift.mad_outliers(_events(spark, rows)).collect()
    assert out == []


def test_mad_outliers_resists_outlier_contamination(spark):
    # 40% wild values: mean/std z-score would mask them; MAD still flags all
    bulk = [(i, "g", 100.0 + (i % 7)) for i in range(60)]
    wild = [(1000 + i, "g", 1e6 + i) for i in range(40)]
    out = drift.mad_outliers(_events(spark, bulk + wild)).collect()
    assert {r["event_id"] for r in out} == {1000 + i for i in range(40)}


def test_mad_outliers_approx_path_agrees_on_clear_outliers(spark):
    # the t-digest scale path must flag the same unambiguous outliers
    rows = [(i, "a", 10.0 + (i % 5) * 0.1) for i in range(40)] + [(900, "a", 9e4)]
    exact = drift.mad_outliers(_events(spark, rows)).collect()
    approx = drift.mad_outliers(_events(spark, rows), exact=False).collect()
    assert [r["event_id"] for r in exact] == [900]
    assert [r["event_id"] for r in approx] == [900]


def test_seasonal_anomalies_flags_only_seasonal_outliers(spark):
    import datetime as dt

    from penr_oz_agent_memory_rust_spark.operators.drift import seasonal_anomalies

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # baseline: hour 0 centered at 10 (sd ~1), hour 12 centered at 100
    for d in range(40):
        rows.append((1000 + d, base + dt.timedelta(days=d % 10), "t", 10.0 + (d % 3 - 1)))
        rows.append(
            (2000 + d, base + dt.timedelta(days=d % 10, hours=12), "t", 100.0 + (d % 3 - 1))
        )
    bdf = spark.createDataFrame(rows, "event_id bigint, ts timestamp, event_type string, value double")
    cur = spark.createDataFrame(
        [
            # 100 at hour 12 is normal; 100 at hour 0 is a seasonal anomaly
            (1, base + dt.timedelta(days=20, hours=12), "t", 100.0),
            (2, base + dt.timedelta(days=20, hours=0), "t", 100.0),
            # unprofiled hour never flags
            (3, base + dt.timedelta(days=20, hours=5), "t", 9999.0),
        ],
        "event_id bigint, ts timestamp, event_type string, value double",
    )
    out = seasonal_anomalies(bdf, cur, threshold=3.0, min_baseline=10)
    flagged = {r.event_id for r in out.collect()}
    assert flagged == {2}


def test_seasonal_anomalies_zero_variance_cell_never_flags(spark):
    import datetime as dt

    from penr_oz_agent_memory_rust_spark.operators.drift import seasonal_anomalies

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    bdf = spark.createDataFrame(
        [(i, base + dt.timedelta(days=i), "t", 5.0) for i in range(20)],
        "event_id bigint, ts timestamp, event_type string, value double",
    )
    cur = spark.createDataFrame(
        [(99, base + dt.timedelta(days=30), "t", 50.0)],
        "event_id bigint, ts timestamp, event_type string, value double",
    )
    assert (
        seasonal_anomalies(bdf, cur, threshold=3.0, min_baseline=5).count() == 0
    )
