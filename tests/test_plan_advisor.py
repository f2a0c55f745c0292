"""Plan-advisor unit checks + the suite-wide hygiene sweep: no gate query
may plan a cartesian product or row-at-a-time Python eval. README claims
this globally; this test enforces it for every `queries()` entry instead
of relying on per-query pins."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.plans import advisor


def test_detects_cartesian(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.range(10)
        b = spark.range(10).withColumnRenamed("id", "id2")
        found = advisor.analyze(a.crossJoin(b))
        assert any(f.code == "CARTESIAN" and f.severity == "critical" for f in found)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_detects_row_python_udf(spark):
    slow = F.udf(lambda x: x + 1, "bigint")
    df = spark.range(10).select(slow(F.col("id")))
    found = advisor.analyze(df)
    assert any(f.code == "ROW_PYTHON" for f in found)
    # the Arrow path must NOT flag
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def fast(s: pd.Series) -> pd.Series:
        return s + 1

    assert not advisor.criticals(advisor.analyze(spark.range(10).select(fast("id"))))


def test_detects_global_sort_limit_in_text():
    plan = """
(3) GlobalLimit
(2) Sort [x ASC]
(1) Scan parquet
"""
    found = advisor.analyze_plan_text(plan)
    assert any(f.code == "GLOBAL_SORT_LIMIT" for f in found)
    # heap-based top-k is the sanctioned form
    ok = "(2) TakeOrderedAndProject\n(1) Scan parquet\n"
    assert not any(f.code == "GLOBAL_SORT_LIMIT" for f in advisor.analyze_plan_text(ok))


def test_detects_many_shuffles_in_text():
    plan = "\n".join(f"({i}) Exchange" for i in range(1, 7))
    found = advisor.analyze_plan_text(plan, max_shuffles=4)
    assert any(f.code == "MANY_SHUFFLES" for f in found)
    assert not advisor.analyze_plan_text(plan, max_shuffles=10)


def test_clean_topk_plan_has_no_findings(spark, sf_dir):
    from penr_oz_agent_memory_rust_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    df = emb.orderBy(F.col("vec_id").desc()).limit(5)
    assert not advisor.criticals(advisor.analyze(df))


@pytest.mark.slow
def test_sweep_all_gate_queries_zero_criticals(spark, sf_dir):
    """Every driver-contract query plan must be free of critical
    anti-patterns (cartesian products, row-Python eval). Streaming gates
    are skipped — calling them runs real streaming jobs; their output
    plans are plain batch reads of the streamed stores."""
    import __spark_entry__ as entrymod

    failures = {}
    for name, fn in entrymod.queries().items():
        if name.startswith("stream_"):
            continue
        try:
            crits = advisor.criticals(advisor.analyze(fn(spark, sf_dir)))
        except Exception as e:  # noqa: BLE001
            failures[name] = f"error: {e}"
            continue
        if crits:
            failures[name] = [f"{c.code}: {c.detail}" for c in crits]
    assert not failures, failures
