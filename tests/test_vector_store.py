"""Qdrant-path parity — ports the reference vector-store tests minus HTTP
mocking (reference src/vector_store.rs:383-653): upsert id generation /
custom id / reserved-key rejection; search parse with "text" stripped from
metadata; threshold; empty results; collection ensure."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import vector_store
from penr_oz_agent_memory_rust_spark.schemas import MEMORY_POINTS_SCHEMA


def ts(i: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1, 0, 0, i)


NULLABLE_POINTS_DDL = (
    "id string, vector array<float>, text string, session_id string, "
    "metadata map<string,string>, updated_at timestamp"
)


def points_df(spark, rows):
    # id nullable on input: the reference accepts id: Option<Uuid>
    # (src/routes.rs:193-195) and generates one when absent.
    return spark.createDataFrame(rows, NULLABLE_POINTS_DDL)


@pytest.fixture()
def points(spark):
    return points_df(
        spark,
        [
            ("p1", [1.0, 0.0], "first", None, {"k": "v"}, ts(1)),
            ("p2", [0.9, 0.1], "second", "sess-1", {"session_id": "sess-1"}, ts(1)),
            ("p3", [0.0, 1.0], "third", None, None, ts(1)),
        ],
    )


def test_upsert_generates_id_when_null(spark, points):
    # src/vector_store.rs:486-510
    new = points_df(spark, [(None, [0.5, 0.5], "new point", None, None, ts(2))])
    out = vector_store.upsert(points, new)
    assert out.count() == 4
    new_row = out.filter(F.col("text") == "new point").first()
    assert new_row["id"] and len(new_row["id"]) == 36


def test_upsert_custom_id_replaces(spark, points):
    # src/vector_store.rs:513-535: same id => last writer wins
    new = points_df(spark, [("p1", [0.0, 0.1], "replaced", None, None, ts(2))])
    out = vector_store.upsert(points, new)
    assert out.count() == 3
    assert out.filter(F.col("id") == "p1").first()["text"] == "replaced"


def test_reserved_key_rejection(spark):
    # src/vector_store.rs:538-567 + src/routes.rs:231-240
    rows = points_df(
        spark,
        [
            ("a", [1.0], "ok", None, {"good": "1"}, ts(1)),
            ("b", [1.0], "bad-text-key", None, {"text": "x"}, ts(1)),
            ("c", [1.0], "bad-session-key", None, {"session_id": "x"}, ts(1)),
            ("d", [1.0], "no-meta", None, None, ts(1)),
        ],
    )
    valid, rejects = vector_store.validate_reserved_keys(rows)
    assert {r["id"] for r in valid.collect()} == {"a", "d"}
    assert {r["id"] for r in rejects.collect()} == {"b", "c"}


def test_enrich_session_id(spark):
    # P8, src/routes.rs:271-274
    rows = points_df(
        spark,
        [
            ("a", [1.0], "linked", "s9", {"k": "v"}, ts(1)),
            ("b", [1.0], "unlinked", None, {"k": "v"}, ts(1)),
        ],
    )
    out = {r["id"]: r["metadata"] for r in vector_store.enrich_session_id(rows).collect()}
    assert out["a"] == {"k": "v", "session_id": "s9"}
    assert out["b"] == {"k": "v"}


def test_search_projects_hit_and_strips_reserved(spark, points):
    # P7, src/vector_store.rs:574-613: "text"/"session_id" stripped from metadata
    rows = vector_store.search(points, [1.0, 0.0], limit=2).collect()
    assert [r["text"] for r in rows] == ["first", "second"]
    assert rows[0]["metadata"] == {"k": "v"}
    assert rows[1]["metadata"] == {}  # session_id stripped
    assert list(rows[0].asDict()) == ["id", "score", "text", "metadata"]


def test_search_default_limit_is_5(spark):
    # src/routes.rs:167,334
    many = points_df(
        spark,
        [(f"p{i}", [1.0, float(i) / 10], f"t{i}", None, None, ts(1)) for i in range(10)],
    )
    assert vector_store.search(many, [1.0, 0.0]).count() == 5


def test_search_score_threshold(spark, points):
    # P3, src/vector_store.rs:283-285
    rows = vector_store.search(points, [1.0, 0.0], limit=10, score_threshold=0.5).collect()
    assert {r["text"] for r in rows} == {"first", "second"}


def test_search_empty_results(spark):
    # src/vector_store.rs:616-635
    empty = points_df(spark, [])
    assert vector_store.search(empty, [1.0, 0.0], limit=5).count() == 0


def test_ensure_collection_semantics(spark, tmp_path):
    # S6, src/vector_store.rs:112-200: create-if-absent, no-op when present
    from penr_oz_agent_memory_rust_spark.sources.tables import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "points"), MEMORY_POINTS_SCHEMA)
    assert not t.exists()
    t.ensure()
    assert t.exists() and t.read().count() == 0
    t.append(points_df(spark, [("x", [1.0], "t", None, None, ts(1))]))
    t.ensure()  # second ensure must not clobber
    assert t.read().count() == 1


def test_jsonl_and_csv_ingest(spark, tmp_path):
    """S13 wire-format parity: JSON-lines rows flow into the batch store
    pipeline; unknown keys ignored, missing keys NULL (src/routes.rs:189-203)."""
    from penr_oz_agent_memory_rust_spark.operators import memory_store
    from penr_oz_agent_memory_rust_spark.sources.tables import (
        read_memories_csv,
        read_memories_jsonl,
    )

    jl = tmp_path / "inbox.jsonl"
    jl.write_text(
        '{"text": "hello", "metadata": {"k": "v"}, "session": "s1", "unknown_key": 1}\n'
        '{"id": "fixed-id", "text": "world"}\n'
        '{"text": ""}\n'
    )
    df = read_memories_jsonl(spark, str(jl))
    ok, bad = memory_store.validate_nonempty_text(df)
    rows = {r["text"]: r for r in ok.collect()}
    assert set(rows) == {"hello", "world"}
    assert rows["hello"]["metadata"] == {"k": "v"} and rows["hello"]["session"] == "s1"
    assert rows["world"]["id"] == "fixed-id" and rows["world"]["metadata"] is None
    assert bad.count() == 1

    csvf = tmp_path / "inbox.csv"
    csvf.write_text("id,text,session\nc1,csv text,s2\n")
    out = read_memories_csv(spark, str(csvf)).first()
    assert out["id"] == "c1" and out["text"] == "csv text" and out["metadata"] is None


def test_table_overwrite_roundtrip(spark, tmp_path):
    from penr_oz_agent_memory_rust_spark.sources.tables import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "points"), MEMORY_POINTS_SCHEMA)
    t.append(points_df(spark, [("x", [1.0], "t", None, None, ts(1))]))
    survivors = t.read().filter(F.col("id") != "x")
    t.overwrite(survivors)
    assert t.read().count() == 0


def test_python_datasource_memories_jsonl(spark, tmp_path):
    """The custom Python Data Source reads the JSONL wire format with one
    partition per file and serde-default NULLs for missing keys."""
    from penr_oz_agent_memory_rust_spark.sources.python_datasource import (
        MemoriesJsonlDataSource,
    )

    d = tmp_path / "inbox"
    d.mkdir()
    (d / "a.jsonl").write_text(
        '{"id": "m1", "text": "hello", "metadata": {"k": "v"}, "session": "s1"}\n'
        '{"text": "no id or session", "extra_key": "ignored"}\n'
    )
    (d / "b.jsonl").write_text('{"id": "m3", "text": "from second file"}\n')

    spark.dataSource.register(MemoriesJsonlDataSource)
    df = spark.read.format("memories_jsonl").option("path", str(d)).load()
    assert df.rdd.getNumPartitions() == 2  # one per file
    rows = {r["text"]: r for r in df.collect()}
    assert rows["hello"]["id"] == "m1" and rows["hello"]["metadata"] == {"k": "v"}
    assert rows["no id or session"]["id"] is None
    assert rows["no id or session"]["session"] is None
    assert rows["from second file"]["id"] == "m3"


def test_scd2_apply_closes_and_opens_versions(spark):
    import datetime as dt

    from penr_oz_agent_memory_rust_spark.operators.scd2 import scd2_apply

    t0, t1, t2 = (dt.datetime(2020, 1, 1), dt.datetime(2023, 1, 1), dt.datetime(2026, 1, 1))
    dim = spark.createDataFrame(
        [
            (1, "A", t0, t1),   # closed history
            (1, "B", t1, None), # current, will change
            (2, "X", t0, None), # current, untouched
        ],
        "k bigint, attr string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [(1, "C", t2)], "k bigint, attr string, effective_ts timestamp"
    )
    out = scd2_apply(dim, changes, key="k", attrs=["attr"]).collect()
    rows = {(r["k"], r["attr"]): (r["valid_from"], r["valid_to"]) for r in out}
    assert len(out) == 4
    assert rows[(1, "A")] == (t0, t1)          # history untouched
    assert rows[(1, "B")] == (t1, t2)          # closed at effective time
    assert rows[(1, "C")] == (t2, None)        # new current version
    assert rows[(2, "X")] == (t0, None)        # untouched current


def test_python_datasource_streaming_incremental(spark, tmp_path):
    """Streaming half of the connector (SimpleDataSourceStreamReader):
    batch 1 consumes the existing files, a file appended afterwards is
    picked up by the NEXT availableNow run from the same checkpoint —
    exactly-once over the append-only directory contract."""
    import json

    from penr_oz_agent_memory_rust_spark.sources.python_datasource import (
        MemoriesJsonlDataSource,
    )

    spark.dataSource.register(MemoriesJsonlDataSource)
    d = tmp_path / "exports"
    d.mkdir()
    out = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"

    def write_file(name, rows):
        (d / name).write_text("\n".join(json.dumps(r) for r in rows))

    def run_once():
        (
            spark.readStream.format("memories_jsonl")
            .option("path", str(d))
            .load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    write_file("a.jsonl", [{"id": "1", "text": "alpha"}, {"id": "2", "text": "beta"}])
    run_once()
    got1 = {r.id for r in spark.read.parquet(str(out)).collect()}
    assert got1 == {"1", "2"}

    write_file("b.jsonl", [{"id": "3", "text": "gamma", "session": "s1"}])
    run_once()
    rows = {r.id: r for r in spark.read.parquet(str(out)).collect()}
    assert set(rows) == {"1", "2", "3"}  # no duplicates from re-reading a.jsonl
    assert rows["3"].session == "s1"


def test_read_jsonl_rescued_quarantines_corrupt_lines(spark, tmp_path):
    from penr_oz_agent_memory_rust_spark.sources.tables import read_jsonl_rescued

    jl = tmp_path / "crawl.jsonl"
    jl.write_text(
        '{"doc_id": 1, "text": "good one", "n": 8}\n'
        '{"doc_id": 2, "text": "truncated\n'          # corrupt: unclosed
        'not json at all\n'                            # corrupt: garbage
        '{"doc_id": 4, "text": null, "n": 0}\n'        # parses, null field
    )
    df = read_jsonl_rescued(spark, str(jl), "doc_id bigint, text string, n bigint")
    # projecting a data column alongside the corrupt column (the Spark
    # requirement the docstring documents)
    rows = sorted(
        df.select("doc_id", "text", "n", "_corrupt_record").collect(),
        key=lambda r: (r["doc_id"] is None, r["doc_id"] or 0, r["_corrupt_record"] or ""),
    )
    parsed = [r for r in rows if r["_corrupt_record"] is None]
    quarantined = [r for r in rows if r["_corrupt_record"] is not None]
    assert [(r["doc_id"], r["text"], r["n"]) for r in parsed] == [
        (1, "good one", 8),
        (4, None, 0),
    ]
    # corrupt rows: every schema field NULL, raw line preserved verbatim
    assert len(quarantined) == 2
    assert all(r["doc_id"] is None and r["text"] is None for r in quarantined)
    assert {r["_corrupt_record"] for r in quarantined} == {
        '{"doc_id": 2, "text": "truncated',
        "not json at all",
    }


def test_read_jsonl_rescued_rejects_colliding_corrupt_col(spark, tmp_path):
    from penr_oz_agent_memory_rust_spark.sources.tables import read_jsonl_rescued

    jl = tmp_path / "x.jsonl"
    jl.write_text('{"a": 1}\n')
    with pytest.raises(ValueError, match="collides"):
        read_jsonl_rescued(spark, str(jl), "a bigint", corrupt_col="a")
