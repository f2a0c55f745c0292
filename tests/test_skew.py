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


def test_targeted_salted_join_equals_plain_join(spark):
    big = spark.createDataFrame(
        [(1 if i % 10 else (2 if i % 3 else 3), f"row{i}") for i in range(1000)],
        "k int, payload string",
    )
    small = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three"), (4, "four")], "k int, name string"
    )
    plain = big.join(small, "k").select("k", "payload", "name")
    out = skew.salted_join_targeted(big, small, "k", {1: 8, 3: 4}).select(
        "k", "payload", "name"
    )
    assert sorted(map(str, plain.collect())) == sorted(map(str, out.collect()))
    # left semantics keep orphans
    orphan = spark.createDataFrame([(9, "x")], "k int, payload string")
    left = skew.salted_join_targeted(
        big.unionByName(orphan), small, "k", {1: 8}, how="left"
    )
    assert left.filter("k = 9").collect()[0]["name"] is None


def test_targeted_salted_join_fans_out_only_hot_keys(spark):
    """Non-hot keys keep plain equi-join traffic (each small row shipped
    once, each big row unsplit); hot keys fan out per hot_salts — checked
    on the materialized pre-join sides and pinned in the plan: the hot
    list rides two BroadcastHashJoins, the main join is the only
    non-broadcast join."""
    from penr_oz_agent_memory_rust_spark.plans import explain

    big = spark.createDataFrame(
        [(1 if i % 10 else 2, i) for i in range(100)], "k int, v bigint"
    )
    small = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "k int, name string"
    )
    hot = {1: 6}
    out = skew.salted_join_targeted(big, small, "k", hot)
    plan = explain.physical_plan(out)
    import re

    bhj = len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan, flags=re.M))
    other = len(
        re.findall(r"^\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan, flags=re.M)
    )
    assert bhj == 2, plan  # the hot list rides onto both sides
    assert other == 1, plan  # exactly one real (key, salt) equi-join
    # replicate the internal small-side expansion: hot key 1 -> 6 copies,
    # cold keys -> exactly 1 copy each
    from pyspark.sql import functions as F2, types as T

    hot_df = spark.createDataFrame(
        [(1, 6)],
        T.StructType(
            [T.StructField("k", T.IntegerType()), T.StructField("__n_salt", T.IntegerType())]
        ),
    )
    expanded = (
        small.join(F2.broadcast(hot_df), "k", "left")
        .withColumn(
            "__salt",
            F2.explode(
                F2.sequence(F2.lit(0), F2.coalesce(F2.col("__n_salt"), F2.lit(1)) - 1)
            ),
        )
        .groupBy("k")
        .count()
    )
    counts = {r["k"]: r["count"] for r in expanded.collect()}
    assert counts == {1: 6, 2: 1, 3: 1}
    # big side never multiplies rows
    assert out.count() == big.join(small, "k").count()


def test_targeted_salted_join_guards_and_empty_hotlist(spark):
    import pytest

    big = spark.createDataFrame([(1, "a")], "k int, v string")
    small = spark.createDataFrame([(1, "one")], "k int, name string")
    with pytest.raises(ValueError, match="inner|left"):
        skew.salted_join_targeted(big, small, "k", {1: 2}, how="full")
    # empty hot list degrades to the plain join
    assert skew.salted_join_targeted(big, small, "k", {}).count() == 1


def test_hot_key_salts_from_report(spark):
    rows = [("hot",)] * 60 + [("warm",)] * 12 + [("a",)] * 3 + [("b",)] * 3
    df = spark.createDataFrame(rows, "k string")
    rep = skew.skew_report(df, "k", top_n=4)
    # mean cnt = 78/4 = 19.5 -> skew_factor hot ~3.08, warm ~0.62
    salts = skew.hot_key_salts(rep, "k", target_factor=1.0, max_salts=8)
    assert salts["hot"] == 4  # ceil(3.076923) = 4
    assert "a" not in salts and "b" not in salts
    assert skew.hot_key_salts(rep, "k", target_factor=10.0) == {}
