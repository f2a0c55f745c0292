from __future__ import annotations

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators.stats import analyze_columns
from penr_oz_agent_memory_rust_spark.plans import explain
from penr_oz_agent_memory_rust_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_analyze_counts_nulls_and_ndv(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "x int, s string"
    )
    rows = {r.column: r for r in analyze_columns(df, ["x"], ["s"]).collect()}
    assert rows["x"].n_rows == 4 and rows["x"].n_nulls == 1
    assert rows["x"].n_distinct == 2
    assert rows["x"].vmin_num == 1.0 and rows["x"].vmax_num == 2.0
    assert rows["x"].vmin_str is None
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 2
    assert rows["s"].vmin_str == "a" and rows["s"].vmax_str == "b"
    assert rows["s"].vmin_num is None


def test_analyze_single_scan(spark):
    """All five columns' stats must come from ONE scan of the table —
    the plan contains exactly one parquet read."""
    li = load_table(spark, SF_DIR, "lineitem")
    df = analyze_columns(li, ["l_quantity", "l_partkey"], ["l_returnflag"])
    plan = explain.physical_plan(df)
    # formatted plans repeat each node in the detail section: tree + detail
    assert plan.count("Scan parquet") <= 2, plan
    assert "Expand" in plan, plan


def test_analyze_approx_matches_exact_within_error(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r.column: r.n_distinct
        for r in analyze_columns(li, ["l_partkey"], exact_ndv=True).collect()
    }
    approx = {
        r.column: r.n_distinct
        for r in analyze_columns(li, ["l_partkey"], exact_ndv=False).collect()
    }
    rel = abs(approx["l_partkey"] - exact["l_partkey"]) / exact["l_partkey"]
    assert rel < 0.1, (approx, exact)
