"""One mutation-interface contract, two backends: ParquetTable
(overwrite-based, always available) and DeltaTableIO (transactional
MERGE/DELETE/UPDATE, skipped when delta-spark is absent — the env-gated
seam of DEVIATIONS #7). The assertions are identical, so putting the
Delta jars on the classpath proves the swap with zero operator changes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from penr_oz_agent_memory_rust_spark.errors import NotConfiguredError
from penr_oz_agent_memory_rust_spark.sources.delta_tables import (
    DeltaTableIO,
    delta_available,
)
from penr_oz_agent_memory_rust_spark.sources.tables import ParquetTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
        T.StructField("tag", T.StringType(), True),
    ]
)


def backends():
    marks = [] if delta_available() else [pytest.mark.skip(reason="delta-spark absent")]
    return [
        pytest.param(ParquetTable, id="parquet"),
        pytest.param(DeltaTableIO, id="delta", marks=marks),
    ]


@pytest.fixture()
def make_table(spark, tmp_path):
    def _make(cls):
        t = cls(spark, str(tmp_path / "tbl"), SCHEMA)
        t.append(
            spark.createDataFrame(
                [("a", 1, "x"), ("b", 2, "x"), ("c", 3, "y")], SCHEMA
            )
        )
        return t

    return _make


@pytest.mark.parametrize("cls", backends())
def test_merge_upsert_last_writer_wins(spark, make_table, cls):
    t = make_table(cls)
    t.merge_upsert(
        spark.createDataFrame([("b", 20, "z"), ("d", 4, "z")], SCHEMA), ["id"]
    )
    got = {r["id"]: (r["val"], r["tag"]) for r in t.read().collect()}
    assert got == {"a": (1, "x"), "b": (20, "z"), "c": (3, "y"), "d": (4, "z")}


@pytest.mark.parametrize("cls", backends())
def test_delete_where_predicate(spark, make_table, cls):
    t = make_table(cls)
    t.delete_where("tag = 'x'")
    assert {r["id"] for r in t.read().collect()} == {"c"}


@pytest.mark.parametrize("cls", backends())
def test_update_where_touch(spark, make_table, cls):
    # the C3 touch shape: bump a column on matching rows only
    t = make_table(cls)
    t.update_where("id = 'a'", {"val": F.lit(100), "tag": "'touched'"})
    got = {r["id"]: (r["val"], r["tag"]) for r in t.read().collect()}
    assert got["a"] == (100, "touched")
    assert got["b"] == (2, "x") and got["c"] == (3, "y")


def test_delete_where_column_predicate(spark, make_table):
    t = make_table(ParquetTable)
    t.delete_where(F.col("val") >= 2)
    assert {r["id"] for r in t.read().collect()} == {"a"}


def test_delta_backend_gated_without_package(spark, tmp_path):
    if delta_available():
        pytest.skip("delta present; gating path not reachable")
    with pytest.raises(NotConfiguredError, match="delta-spark"):
        DeltaTableIO(spark, str(tmp_path / "d"), SCHEMA)
