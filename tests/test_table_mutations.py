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
from penr_oz_agent_memory_rust_spark.sources.versioned_tables import VersionedParquetTable

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
        pytest.param(VersionedParquetTable, id="versioned"),
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


def test_mutation_sequence_matches_dict_model(spark, tmp_path):
    """Model-based check: a fixed random sequence of merge_upsert /
    delete_where / update_where applied to a ParquetTable must equal the
    same sequence applied to a plain Python dict (one deterministic
    seeded run — each table mutation launches Spark jobs, so this is a
    single scripted trajectory, not a hypothesis search)."""
    import random

    rng = random.Random(42)
    t = ParquetTable(spark, str(tmp_path / "model_tbl"), SCHEMA)
    model: dict[str, tuple[int, str]] = {}
    ids = [f"k{i}" for i in range(12)]

    for step in range(18):
        op = rng.choice(["upsert", "delete", "update"])
        if op == "upsert":
            picks = rng.sample(ids, rng.randint(1, 3))
            rows = [(i, rng.randint(0, 99), rng.choice("xyz")) for i in picks]
            t.merge_upsert(spark.createDataFrame(rows, SCHEMA), ["id"])
            for i, v, g in rows:
                model[i] = (v, g)
        elif op == "delete":
            cut = rng.randint(0, 99)
            t.delete_where(F.col("val") < cut)
            model = {k: vg for k, vg in model.items() if not (vg[0] < cut)}
        else:
            tag = rng.choice("xyz")
            bump = rng.randint(100, 199)
            t.update_where(F.col("tag") == tag, {"val": F.lit(bump)})
            model = {
                k: ((bump, g) if g == tag else (v, g)) for k, (v, g) in model.items()
            }
    got = {r["id"]: (r["val"], r["tag"]) for r in t.read().collect()}
    assert got == model
