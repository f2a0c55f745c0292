"""Salted-join / salted-agg equivalence with the unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import skew


def test_salted_join_equals_plain_join(spark):
    # hot key: 90% of big rows share key 1
    big = spark.createDataFrame(
        [(1 if i % 10 else 2, f"row{i}") for i in range(1000)], "k int, payload string"
    )
    small = spark.createDataFrame([(1, "one"), (2, "two"), (3, "three")], "k int, name string")
    plain = big.join(small, "k").select("k", "payload", "name")
    salted = skew.salted_join(big, small, "k").select("k", "payload", "name")
    assert sorted(map(str, plain.collect())) == sorted(map(str, salted.collect()))


def test_salted_join_left_semantics(spark):
    big = spark.createDataFrame([(1, "a"), (9, "orphan")], "k int, payload string")
    small = spark.createDataFrame([(1, "one")], "k int, name string")
    out = skew.salted_join(big, small, "k", how="left").collect()
    by_key = {r["k"]: r["name"] for r in out}
    assert by_key == {1: "one", 9: None} and len(out) == 2


def test_salted_count_equals_plain_count(spark):
    df = spark.createDataFrame([(i % 3,) for i in range(999)], "k int")
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"] for r in skew.salted_count_by_key(df, "k").collect()}
    assert plain == salted


def test_skew_report_hand_computed(spark):
    from penr_oz_agent_memory_rust_spark.operators import skew

    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("a",), ("b",), ("c",)]
    df = spark.createDataFrame(rows, "k string")
    out = skew.skew_report(df, "k", top_n=3).collect()
    # 12 rows / 5 keys -> mean 2.4
    assert [(r["k"], r["cnt"]) for r in out] == [("hot", 6), ("warm", 3), ("a", 1)]
    assert out[0]["frac"] == 0.5
    assert out[0]["skew_factor"] == 2.5  # 6 / 2.4
    assert out[2]["skew_factor"] == round(1 / 2.4, 6)


def test_skew_report_is_topk_no_window(spark, sf_dir):
    from penr_oz_agent_memory_rust_spark.operators import skew
    from penr_oz_agent_memory_rust_spark.plans import explain
    from penr_oz_agent_memory_rust_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = explain.physical_plan(skew.skew_report(ev, "user_id", 10))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
