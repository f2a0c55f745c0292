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
