"""Count-min sketch: upper-bound guarantee, bounded size, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import sketches


def _tokens(spark):
    # skewed: "hot" 100x, "warm" 10x, 50 distinct cold singletons
    rows = (
        [("hot",)] * 100 + [("warm",)] * 10 + [(f"cold{i}",) for i in range(50)]
    )
    return spark.createDataFrame(rows, "w string")


def test_cms_estimates_upper_bound_true_counts(spark):
    toks = _tokens(spark)
    exact = {r["w"]: r["c"] for r in toks.groupBy("w").agg(F.count("*").alias("c")).collect()}
    table = sketches.cms_counter_table(toks, "w", width=32, depth=4)
    est = {
        r["w"]: r["est"]
        for r in sketches.cms_estimate(
            toks.select("w").distinct(), table, "w", width=32, depth=4
        ).collect()
    }
    assert set(est) == set(exact)
    for w, c in exact.items():
        assert est[w] >= c  # CMS never underestimates


def test_cms_counter_table_is_bounded(spark):
    table = sketches.cms_counter_table(_tokens(spark), "w", width=32, depth=4)
    assert table.count() <= 32 * 4
    total = table.agg(F.sum("c")).first()[0]
    assert total == 160 * 4  # every occurrence lands once per depth row


def test_cms_heavy_hitters_ranks_hot_first(spark):
    out = sketches.cms_heavy_hitters(_tokens(spark), "w", k=3, width=1024, depth=4).collect()
    assert out[0]["w"] == "hot" and out[0]["est"] == 100
    assert out[1]["w"] == "warm" and out[1]["est"] == 10


def test_cms_deterministic(spark):
    toks = _tokens(spark)
    a = sorted(sketches.cms_heavy_hitters(toks, "w", k=10, width=64).collect())
    b = sorted(sketches.cms_heavy_hitters(toks, "w", k=10, width=64).collect())
    assert a == b


def test_cms_wide_sketch_is_exact(spark):
    # width >> vocab: no collisions in at least one row -> est == exact
    toks = _tokens(spark)
    exact = {r["w"]: r["c"] for r in toks.groupBy("w").agg(F.count("*").alias("c")).collect()}
    est = {
        r["w"]: r["est"]
        for r in sketches.cms_heavy_hitters(toks, "w", k=60, width=8192, depth=4).collect()
    }
    assert est == dict(sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:60])


# ------------------------------------------------------------------ HLL


def test_hll_estimate_accuracy(spark):
    from penr_oz_agent_memory_rust_spark.operators.sketches import hll_distinct

    n = 10_000
    items = spark.range(n).select(F.col("id").cast("string").alias("u"))
    # duplicates must not move the estimate: union the same ids 3x
    tripled = items.unionAll(items).unionAll(items)
    est = hll_distinct(tripled, "u", m=64).first()["est"]
    assert abs(est - n) / n < 0.25  # 1.04/sqrt(64) ~ 13% std error


def test_hll_duplicates_invariant(spark):
    from penr_oz_agent_memory_rust_spark.operators.sketches import hll_distinct

    items = spark.range(500).select(F.col("id").cast("string").alias("u"))
    once = hll_distinct(items, "u").first()["est"]
    thrice = hll_distinct(items.unionAll(items).unionAll(items), "u").first()["est"]
    assert once == thrice


def test_hll_registers_merge_by_max(spark):
    from penr_oz_agent_memory_rust_spark.operators.sketches import hll_registers

    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("u"))
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("u"))
    ra = {r["bucket"]: r["r"] for r in hll_registers(a, "u").collect()}
    rb = {r["bucket"]: r["r"] for r in hll_registers(b, "u").collect()}
    ru = {r["bucket"]: r["r"] for r in hll_registers(a.unionAll(b), "u").collect()}
    assert ru == {k: max(ra[k], rb[k]) for k in ra}  # mergeable rollup


def test_hll_small_range_linear_counting(spark):
    from penr_oz_agent_memory_rust_spark.operators.sketches import hll_distinct

    # 20 distinct << 2.5*m: the linear-counting branch fires and is tight
    items = spark.range(20).select(F.col("id").cast("string").alias("u"))
    est = hll_distinct(items, "u", m=64).first()["est"]
    assert abs(est - 20) <= 6
