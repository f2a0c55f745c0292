from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators.incremental_agg import (
    agg_state,
    finalize,
    merge_states,
)
from penr_oz_agent_memory_rust_spark.plans import explain
from penr_oz_agent_memory_rust_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF_DIR, "orders")


def _final_rows(df):
    return {
        tuple(r[k] for k in ("o_orderpriority",)): r
        for r in df.collect()
    }


def test_merge_equals_full_recompute(spark, orders):
    """state(a ∪ b) == merge(state(a), state(b)) — the algebraic
    contract, on a real split of orders."""
    cut = F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz")
    base = agg_state(orders.filter(cut), ["o_orderpriority"], "o_totalprice")
    delta = agg_state(orders.filter(~cut), ["o_orderpriority"], "o_totalprice")
    merged = _final_rows(finalize(merge_states(base, delta)))
    full = _final_rows(finalize(agg_state(orders, ["o_orderpriority"], "o_totalprice")))
    assert merged.keys() == full.keys()
    for k in full:
        m, f = merged[k], full[k]
        assert m.n_rows == f.n_rows and m.vmin == f.vmin and m.vmax == f.vmax
        # sums accumulate in a different order across the two plans:
        # equal to well beyond the 4/6dp the finalize view rounds to
        assert abs(m.total - f.total) < 1e-6
        assert abs(m.vavg - f.vavg) < 1e-9
        # ssq is ~1e15 here, so cancellation leaves ~1e-4 ABSOLUTE noise
        # between accumulation orders — compare var relatively (and keep
        # vvar out of any value-hash oracle for the same reason)
        assert abs(m.vvar - f.vvar) <= 1e-9 * max(1.0, abs(f.vvar))


def test_merge_is_associative_over_three_splits(spark, orders):
    s1 = agg_state(orders.filter(F.col("o_orderkey") % 3 == 0), ["o_orderstatus"], "o_totalprice")
    s2 = agg_state(orders.filter(F.col("o_orderkey") % 3 == 1), ["o_orderstatus"], "o_totalprice")
    s3 = agg_state(orders.filter(F.col("o_orderkey") % 3 == 2), ["o_orderstatus"], "o_totalprice")
    left = finalize(merge_states(merge_states(s1, s2), s3))
    flat = finalize(merge_states(s1, s2, s3))
    a = {r.o_orderstatus: r for r in left.collect()}
    b = {r.o_orderstatus: r for r in flat.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k].n_rows == b[k].n_rows
        assert abs(a[k].total - b[k].total) < 1e-6


def test_hll_state_merges_within_sketch_error(spark, orders):
    """The distinct-count state survives the split+merge and lands within
    HLL error of the exact distinct customer count per priority."""
    cut = F.col("o_orderkey") % 2 == 0
    base = agg_state(orders.filter(cut), ["o_orderpriority"], "o_totalprice", distinct_col="o_custkey")
    delta = agg_state(orders.filter(~cut), ["o_orderpriority"], "o_totalprice", distinct_col="o_custkey")
    est = {
        r.o_orderpriority: r.n_distinct_est
        for r in finalize(merge_states(base, delta)).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k in exact:
        assert abs(est[k] - exact[k]) / exact[k] < 0.05, (k, est[k], exact[k])


def test_merge_never_rescans_base_single_shuffle(spark, orders, tmp_path):
    """The refresh plan: states read from parquet, merged with exactly
    one hash exchange — group-cardinality inputs, no base-table scan."""
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    agg_state(orders.limit(1000), ["o_orderpriority"], "o_totalprice").write.parquet(p1)
    agg_state(orders.limit(2000), ["o_orderpriority"], "o_totalprice").write.parquet(p2)
    merged = merge_states(spark.read.parquet(p1), spark.read.parquet(p2))
    assert explain.count_shuffle_exchanges(merged) == 1, explain.physical_plan(merged)
    plan = explain.physical_plan(merged)
    assert "orders.parquet" not in plan, plan


def test_hist_state_merge_equals_direct(spark):
    from pyspark.sql import functions as F

    from penr_oz_agent_memory_rust_spark.operators.incremental_agg import (
        hist_state,
        merge_hist_states,
    )

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(100)] + [("b", float(i * 2)) for i in range(50)],
        "k string, v double",
    )
    direct = hist_state(df, ["k"], "v", 0.0, 200.0, 16)
    merged = merge_hist_states(
        hist_state(df.filter(F.col("v") < 60), ["k"], "v", 0.0, 200.0, 16),
        hist_state(df.filter(F.col("v") >= 60), ["k"], "v", 0.0, 200.0, 16),
    )
    as_map = lambda d: {(r["k"], r["bin"]): r["cnt"] for r in d.collect()}  # noqa: E731
    assert as_map(direct) == as_map(merged)


def test_hist_quantile_error_bounded_by_bin_width(spark):
    from penr_oz_agent_memory_rust_spark.operators.incremental_agg import (
        hist_state,
        quantile_from_hist,
    )
    from penr_oz_agent_memory_rust_spark.sources.tables import load_table
    import os

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    o = load_table(spark, sf, "orders")
    lo, hi, bins = 0.0, 500_000.0, 64
    st = hist_state(o, ["o_orderpriority"], "o_totalprice", lo, hi, bins)
    est = {
        r["o_orderpriority"]: r["q_est"]
        for r in quantile_from_hist(st, ["o_orderpriority"], 0.5, lo, hi, bins).collect()
    }
    exact = {
        r["o_orderpriority"]: r["m"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.expr("percentile(o_totalprice, 0.5)").alias("m"))
        .collect()
    }
    width = (hi - lo) / bins
    for k, e in est.items():
        assert abs(e - exact[k]) <= width, (k, e, exact[k])


def test_hist_state_clamps_out_of_range(spark):
    from penr_oz_agent_memory_rust_spark.operators.incremental_agg import hist_state

    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.0), ("a", 99.9), ("a", 250.0)], "k string, v double"
    )
    rows = {r["bin"]: r["cnt"] for r in hist_state(df, ["k"], "v", 0.0, 100.0, 10).collect()}
    assert rows[0] == 2  # -5 clamps into bin 0 alongside 0.0
    assert rows[9] == 2  # 99.9 lands in the top bin; 250 clamps into it


def test_hist_quantile_hand_pinned(spark):
    """Independent pin (r9 verdict ask #6): the incremental_quantile_refresh
    oracle replays the engine's histogram-interpolation arithmetic in SQL,
    so the gate passes green even if both share a bug. Hand derivation:
    values 0..9, 10 bins over [0,10) -> every bin cnt=1, cum(b)=b+1.
    q=0.5: hit bin 4 (cum 5 >= 5, cum-cnt 4 < 5), est = 4 + (5-4)/1 = 5.0.
    q=0.25: hit bin 2 (cum 3 >= 2.5, cum-cnt 2 < 2.5), est = 2 + 0.5 = 2.5."""
    from penr_oz_agent_memory_rust_spark.operators.incremental_agg import (
        hist_state,
        quantile_from_hist,
    )

    df = spark.createDataFrame([("k", float(i)) for i in range(10)], "k string, v double")
    st = hist_state(df, ["k"], "v", 0.0, 10.0, 10)
    assert quantile_from_hist(st, ["k"], 0.5, 0.0, 10.0, 10).first()["q_est"] == 5.0
    assert quantile_from_hist(st, ["k"], 0.25, 0.0, 10.0, 10).first()["q_est"] == 2.5
