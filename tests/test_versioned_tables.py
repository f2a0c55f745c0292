"""VersionedParquetTable: the Delta-style guarantees the plain-file layer
claims — atomic commits, snapshot isolation, time travel, zero-copy
appends, rollback, vacuum, and optimistic-concurrency conflicts."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F, types as T

from penr_oz_agent_memory_rust_spark.sources.versioned_tables import (
    ConcurrentWriteError,
    VersionedParquetTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("val", T.LongType(), True),
    ]
)


@pytest.fixture()
def table(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "vt"), SCHEMA)
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    return t


def test_time_travel_and_history(spark, table):
    table.append(spark.createDataFrame([("c", 3)], SCHEMA))
    table.delete_where(F.col("id") == "a")
    # versions: 1 create, 2 first append, 3 second append, 4 delete
    assert [h["op"] for h in table.history()] == ["create", "append", "append", "delete"]
    assert {r["id"] for r in table.read().collect()} == {"b", "c"}
    assert {r["id"] for r in table.read(version=3).collect()} == {"a", "b", "c"}
    assert {r["id"] for r in table.read(version=2).collect()} == {"a", "b"}
    assert table.read(version=1).count() == 0


def test_append_is_zero_copy(spark, table):
    files_before = set(glob.glob(os.path.join(table.path, "files", "*", "*.parquet")))
    table.append(spark.createDataFrame([("c", 3)], SCHEMA))
    files_after = set(glob.glob(os.path.join(table.path, "files", "*", "*.parquet")))
    assert files_before < files_after  # old files untouched, only new added
    mtimes = {p: os.path.getmtime(p) for p in files_before}
    assert all(os.path.getmtime(p) == m for p, m in mtimes.items())


def test_rollback_restores_and_preserves_history(spark, table):
    table.delete_where(F.col("id") == "a")
    assert {r["id"] for r in table.read().collect()} == {"b"}
    table.rollback(2)  # the version right after the initial append
    assert {r["id"] for r in table.read().collect()} == {"a", "b"}
    assert table.history()[-1]["op"] == "rollback_to_v2"
    # the delete version is still readable (revert, not reset)
    assert {r["id"] for r in table.read(version=3).collect()} == {"b"}


def test_reader_snapshot_survives_concurrent_overwrite(spark, table):
    snap = table.read()  # resolves version 2's file list NOW
    table.overwrite(spark.createDataFrame([("z", 99)], SCHEMA))
    # the old files still exist (no vacuum), so the snapshot still evaluates
    assert {r["id"] for r in snap.collect()} == {"a", "b"}
    assert {r["id"] for r in table.read().collect()} == {"z"}


def test_conflicting_rewrite_raises(spark, table):
    # simulate a racing writer: commit a manifest between this op's base
    # snapshot and its commit by pre-creating the next version's file
    base = table.current_version()
    files = table._load_manifest(base)["files"]
    assert table._try_commit(base + 1, files, "racer")
    with pytest.raises(ConcurrentWriteError):
        table._rewrite(spark.createDataFrame([("q", 7)], SCHEMA), base, "update")
    # appends do NOT conflict — they retry onto the new head
    table.append(spark.createDataFrame([("c", 3)], SCHEMA))
    assert {r["id"] for r in table.read().collect()} == {"a", "b", "c"}


def test_vacuum_reclaims_unreachable_files(spark, table):
    table.overwrite(spark.createDataFrame([("z", 99)], SCHEMA))
    n_files = len(glob.glob(os.path.join(table.path, "files", "*", "*.parquet")))
    deleted = table.vacuum(keep_last=1)
    assert deleted >= 1
    left = len(glob.glob(os.path.join(table.path, "files", "*", "*.parquet")))
    assert left == n_files - deleted
    # current contents unaffected; time travel beyond the window is gone
    assert {r["id"] for r in table.read().collect()} == {"z"}
    assert table._versions() == [table.current_version()]


def test_crash_safe_partial_commit_is_invisible(spark, table):
    # a crash after data files land but before the manifest: write files
    # directly and never commit — readers and history must not change
    before = [h["version"] for h in table.history()]
    table._write_commit_files(spark.createDataFrame([("ghost", 0)], SCHEMA))
    assert [h["version"] for h in table.history()] == before
    assert {r["id"] for r in table.read().collect()} == {"a", "b"}
    # vacuum reclaims the orphaned files
    assert table.vacuum(keep_last=len(table._versions())) >= 1


def test_manifest_data_skipping_prunes_files(spark, tmp_path):
    """Each append commits its own files with footer min/max recorded in
    the manifest; a range probe must touch only the overlapping files and
    still return exactly the filtered rows."""
    t = VersionedParquetTable(spark, str(tmp_path / "skip"), SCHEMA)
    for lo in (0, 100, 200, 300):  # 4 commits with disjoint val ranges
        t.append(
            spark.createDataFrame(
                [(f"r{lo + i}", lo + i) for i in range(50)], "id string, val bigint"
            ).coalesce(1)
        )
    keep, total = t.prune_files("val", lo=120, hi=180)
    assert total >= 4 and len(keep) < total  # skipped at least the non-overlap files
    got = t.read_pruned("val", lo=120, hi=180).filter(
        (F.col("val") >= 120) & (F.col("val") <= 180)
    )
    want = t.read().filter((F.col("val") >= 120) & (F.col("val") <= 180))
    assert sorted(r["val"] for r in got.collect()) == sorted(r["val"] for r in want.collect())
    # an out-of-range probe reads nothing
    none_keep, _ = t.prune_files("val", lo=10_000)
    assert none_keep == []
    assert t.read_pruned("val", lo=10_000).count() == 0
    # stats survive rollback and vanish only with their files on vacuum
    t.rollback(2)
    k2, tot2 = t.prune_files("val", lo=0, hi=10)
    assert len(k2) == tot2 == 1


def test_optimize_compact_and_sort_improve_skipping(spark, tmp_path):
    """OPTIMIZE is a contents-preserving commit: compaction shrinks the
    file count; sort-clustering turns a useless skipping index (every
    file spans the whole value range after hashed appends) into real
    pruning; time travel still reaches the messy layout."""
    t = VersionedParquetTable(spark, str(tmp_path / "opt"), SCHEMA)
    import random

    rng = random.Random(7)
    vals = list(range(400))
    rng.shuffle(vals)
    for i in range(4):  # interleaved appends: every file spans ~the full range
        chunk = vals[i * 100 : (i + 1) * 100]
        t.append(
            spark.createDataFrame([(f"r{v}", v) for v in chunk], SCHEMA).repartition(2)
        )
    before_keep, before_total = t.prune_files("val", lo=10, hi=40)
    assert len(before_keep) == before_total  # nothing prunable yet
    pre_optimize = t.current_version()
    t.optimize(n_files=8, sort_by="val")
    after_keep, after_total = t.prune_files("val", lo=10, hi=40)
    assert after_total == 8 and len(after_keep) <= 2, (after_keep, after_total)
    # contents identical, history intact
    assert t.read().count() == 400
    assert sorted(r["val"] for r in t.read_pruned("val", lo=10, hi=40)
                  .filter((F.col("val") >= 10) & (F.col("val") <= 40)).collect()) == list(range(10, 41))
    assert t.read(version=pre_optimize).count() == 400
    assert t.history()[-1]["op"] == "optimize_sort_val"
    # plain compaction: one file, same rows
    t.optimize()
    assert t.history()[-1]["op"] == "optimize_compact"
    assert t.prune_files("val")[1] == 1 and t.read().count() == 400


def test_optimize_zorder_prunes_both_dims(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.LongType(), False),
        ]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "zopt"), schema)
    side = 64
    rows = [(x, y) for x in range(side) for y in range(side)]
    t.append(spark.createDataFrame(rows, schema).repartition(8))
    t.optimize(n_files=16, zorder_by=("a", "b"), zorder_bits=8)
    ka, ta_ = t.prune_files("a", lo=0, hi=7)
    kb, tb_ = t.prune_files("b", lo=0, hi=7)
    assert ta_ == tb_ == 16
    # z-clustering prunes on EITHER dimension alone
    assert len(ka) < 16 and len(kb) < 16, (len(ka), len(kb))
    got = t.read_pruned("a", lo=0, hi=7).filter(F.col("a") <= 7).count()
    assert got == 8 * side


def test_streaming_ingest_idempotent_txn_commits(spark, tmp_path):
    """Micro-batches land as atomic zero-copy commits tagged with
    (app, batch) txn ids; a REPLAYED batch id is a no-op (exactly-once on
    at-least-once foreachBatch), and each batch is time-travelable."""
    from penr_oz_agent_memory_rust_spark.streaming.ingest import (
        run_versioned_table_ingest_once,
    )

    incoming = str(tmp_path / "incoming")
    t = VersionedParquetTable(spark, str(tmp_path / "lake"), SCHEMA)
    spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(incoming)
    assert run_versioned_table_ingest_once(spark, incoming, t) == 1
    spark.createDataFrame([("c", 3)], SCHEMA).coalesce(1).write.mode("append").parquet(
        incoming
    )
    assert run_versioned_table_ingest_once(spark, incoming, t) == 1
    assert {r["id"] for r in t.read().collect()} == {"a", "b", "c"}
    # simulate a replay of batch 1: same txn ids -> recorded no-op
    replay = spark.createDataFrame([("c", 3)], SCHEMA)
    before = t.current_version()
    t.append(replay, txn_app="versioned-ingest", txn_id=1)
    assert t.current_version() == before
    assert t.read().count() == 3
    # a NEW txn id still appends
    t.append(replay, txn_app="versioned-ingest", txn_id=2)
    assert t.read().count() == 4
    # every streamed batch is a time-travelable version
    ops = [h["op"] for h in t.history()]
    assert ops.count("append") == 3 and ops[0] == "create"


def test_change_data_feed(spark, table):
    """Appends feed as zero-copy file-diff inserts; a delete feeds the
    removed row; an update feeds a delete+insert pair; optimize (layout
    only) feeds nothing."""
    v1 = table.current_version()
    table.append(spark.createDataFrame([("c", 3), ("d", 4)], SCHEMA))
    v2 = table.current_version()
    cdf = {(r["id"], r["_change_type"]) for r in table.changes(v1, v2).collect()}
    assert cdf == {("c", "insert"), ("d", "insert")}
    table.delete_where(F.col("id") == "a")
    v3 = table.current_version()
    cdf = {(r["id"], r["_change_type"]) for r in table.changes(v2, v3).collect()}
    assert cdf == {("a", "delete")}
    table.update_where(F.col("id") == "b", {"val": F.lit(20)})
    v4 = table.current_version()
    got = {(r["id"], r["val"], r["_change_type"]) for r in table.changes(v3, v4).collect()}
    assert got == {("b", 2, "delete"), ("b", 20, "insert")}
    table.optimize()
    assert table.changes(v4).count() == 0
    # the full span composes too: net effect from v1 ('a','b'@2) to now
    net = {(r["id"], r["val"], r["_change_type"]) for r in table.changes(v1).collect()}
    assert net == {
        ("c", 3, "insert"),
        ("d", 4, "insert"),
        ("a", 1, "delete"),
        ("b", 2, "delete"),
        ("b", 20, "insert"),
    }


def test_schema_evolution_add_column(spark, table):
    """add_columns is a zero-copy metadata commit: old files read as null
    in the new column, new appends carry values, time travel still uses
    the narrower schema, and a handle opened with the ORIGINAL StructType
    sees the widened table."""
    import glob

    v_narrow = table.current_version()
    files_before = set(glob.glob(os.path.join(table.path, "files", "*", "*.parquet")))
    table.add_columns(T.StructField("tag", T.StringType(), True))
    assert set(glob.glob(os.path.join(table.path, "files", "*", "*.parquet"))) == files_before
    assert [f.name for f in table.current_schema().fields] == ["id", "val", "tag"]
    # old rows surface with null tag
    got = {r["id"]: r["tag"] for r in table.read().collect()}
    assert got == {"a": None, "b": None}
    # new appends carry the column (through a FRESH handle with the old schema)
    reopened = VersionedParquetTable(spark, table.path, SCHEMA)
    reopened.append(
        spark.createDataFrame([("c", 3, "x")], "id string, val bigint, tag string")
    )
    rows = {r["id"]: r["tag"] for r in reopened.read().collect()}
    assert rows == {"a": None, "b": None, "c": "x"}
    # time travel reads the pre-evolution schema
    assert "tag" not in reopened.read(version=v_narrow).columns
    # non-nullable or duplicate additions are refused
    import pytest as _pt

    with _pt.raises(ValueError):
        table.add_columns(T.StructField("val", T.LongType(), True))
    with _pt.raises(ValueError):
        table.add_columns(T.StructField("req", T.LongType(), False))


def test_merge_upsert_prunes_untouched_files(spark, tmp_path):
    """With per-file key stats, an upsert rewrites ONLY the files whose
    key range overlaps the updates — the rest stay in the manifest
    byte-identical (O(matched files) mutation cost). Results must equal
    full-merge semantics exactly."""
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "pm"), schema)
    for lo in (0, 100, 200, 300):  # 4 disjoint-range commits
        t.append(
            spark.createDataFrame(
                [(lo + i, f"old{lo + i}") for i in range(100)], schema
            ).coalesce(1)
        )
    m_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(t.path, "files", "*", "*.parquet"))
    }
    files_before = t._load_manifest(t.current_version())["files"]
    # updates touch only the 100..199 range (one file) + a brand-new key
    ups = spark.createDataFrame([(150, "NEW"), (151, "NEW"), (999, "NEW")], schema)
    t.merge_upsert(ups, ["k"])
    assert t.history()[-1]["op"] == "merge_upsert_pruned"
    files_after = set(t._load_manifest(t.current_version())["files"])
    untouched = [f for f in files_before if f in files_after]
    assert len(untouched) == 3  # ranges 0-99, 200-299, 300-399 kept zero-copy
    for p, mt in m_before.items():
        if os.path.relpath(p, t.path) in files_after:
            assert os.path.getmtime(p) == mt  # byte-identical survivors
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert len(got) == 401
    assert got[150] == got[151] == got[999] == "NEW"
    assert got[152] == "old152" and got[0] == "old0" and got[399] == "old399"
    # skipping stats stay coherent after the pruned merge
    keep, total = t.prune_files("k", lo=0, hi=50)
    assert len(keep) < total
    # empty update set is a no-op
    before_v = t.current_version()
    t.merge_upsert(spark.createDataFrame([], schema), ["k"])
    assert t.current_version() == before_v


def test_delete_keys_prunes_untouched_files(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "dk"), schema)
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame([(lo + i, f"v{lo + i}") for i in range(100)], schema).coalesce(1)
        )
    files_before = t._load_manifest(t.current_version())["files"]
    t.delete_keys([150, 155], "k")
    assert t.history()[-1]["op"] == "delete_keys_pruned"
    files_after = set(t._load_manifest(t.current_version())["files"])
    assert len([f for f in files_before if f in files_after]) == 2  # 0-99, 200-299 untouched
    assert t.read().count() == 298
    assert t.read().filter(F.col("k").isin([150, 155])).count() == 0
    # keys hitting no file commit nothing
    v = t.current_version()
    t.delete_keys([99999], "k")
    assert t.current_version() == v


def test_vacuum_retention_spares_inflight_files(spark, table):
    """ADVICE r4: with retain_seconds set, vacuum must not reclaim young
    unreferenced files — they may belong to an in-flight commit whose
    manifest has not linked yet. With the window at 0, crash orphans are
    reclaimed as before."""
    table._write_commit_files(spark.createDataFrame([("ghost", 0)], SCHEMA))
    n_all = len(glob.glob(os.path.join(table.path, "files", "*", "*.parquet")))
    assert table.vacuum(keep_last=len(table._versions()), retain_seconds=3600) == 0
    assert len(glob.glob(os.path.join(table.path, "files", "*", "*.parquet"))) == n_all
    # past the window (retain 0) the orphans go
    assert table.vacuum(keep_last=len(table._versions()), retain_seconds=0) >= 1


def test_txn_records_survive_vacuum(spark, table):
    """ADVICE r4: every manifest carries the per-app latest-txn map
    forward, so vacuuming old manifests cannot erase the idempotence
    ledger — a checkpoint-recovered micro-batch replayed AFTER a vacuum
    must still be a no-op."""
    table.append(spark.createDataFrame([("c", 3)], SCHEMA), txn_app="ing", txn_id=0)
    table.append(spark.createDataFrame([("d", 4)], SCHEMA), txn_app="ing", txn_id=1)
    table.vacuum(keep_last=1)
    assert len(table._versions()) == 1  # the recording manifests are gone
    assert table.txn_committed("ing", 0) and table.txn_committed("ing", 1)
    before = table.current_version()
    table.append(spark.createDataFrame([("d", 4)], SCHEMA), txn_app="ing", txn_id=1)
    assert table.current_version() == before and table.read().count() == 4
    # a NEW batch id still lands, and the map keeps the latest id
    table.append(spark.createDataFrame([("e", 5)], SCHEMA), txn_app="ing", txn_id=2)
    assert table.read().count() == 5
    assert table._load_manifest(table.current_version())["txns"] == {"ing": 2}
    # rewrites and rollbacks carry the ledger too
    table.delete_where(F.col("id") == "e")
    table.rollback(table.current_version() - 1)
    assert table.txn_committed("ing", 2)


def test_change_feed_across_schema_evolution(spark, table):
    """ADVICE r4: the CDF is expressed under the DESTINATION version's
    schema. Appends after an add_columns surface the new column on the
    zero-copy fast path; a rewrite fallback spanning the add_columns
    commit null-pads the older snapshot instead of throwing."""
    v1 = table.current_version()
    table.add_columns(T.StructField("tag", T.StringType(), True))
    table.append(
        spark.createDataFrame([("c", 3, "x")], "id string, val bigint, tag string")
    )
    v2 = table.current_version()
    # fast path (pure appends v1 -> v2): new column present, not dropped
    cdf = {(r["id"], r["tag"], r["_change_type"]) for r in table.changes(v1, v2).collect()}
    assert cdf == {("c", "x", "insert")}
    assert set(table.changes(v1, v2).columns) == {"id", "val", "tag", "_change_type"}
    # rewrite fallback spanning the evolution: old snapshot (no 'tag')
    # aligns by null-padding; the delete row carries tag=NULL
    table.delete_where(F.col("id") == "a")
    v3 = table.current_version()
    got = {(r["id"], r["tag"], r["_change_type"]) for r in table.changes(v1, v3).collect()}
    assert got == {("c", "x", "insert"), ("a", None, "delete")}
    # empty-diff shape under the evolved schema too
    assert "tag" in table.changes(v3, v3).columns


def test_cdf_incremental_index_refresh_equals_rebuild(spark, tmp_path):
    """r4 verdict #7: the change data feed has a CONSUMER — a downstream
    token-count index refreshed only from changes() (insert rows add,
    delete rows subtract) must equal a from-scratch rebuild of the final
    state, across an upsert that rewrites AND inserts."""
    from pyspark.sql import functions as F

    sch = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "cdfidx"), sch)
    t.append(
        spark.createDataFrame(
            [(1, "alpha beta"), (2, "beta gamma"), (3, "gamma gamma delta")], sch
        )
    )
    v0 = t.current_version()

    def counts(df, signed=False):
        sign = (
            F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
            if signed
            else F.lit(1)
        )
        return (
            df.select(F.explode(F.split(F.col("text"), " ")).alias("tok"), sign.alias("s"))
            .groupBy("tok")
            .agg(F.sum("s").alias("cnt"))
        )

    stale = counts(t.read())
    # upsert: rewrite doc 2, insert doc 4; then delete doc 3 by key
    t.merge_upsert(
        spark.createDataFrame([(2, "beta beta"), (4, "epsilon alpha")], sch), ["doc_id"]
    )
    t.delete_keys([3], "doc_id")
    delta = counts(t.changes(v0), signed=True).withColumnRenamed("cnt", "d")
    refreshed = {
        r["tok"]: r["n"]
        for r in stale.join(delta, "tok", "full_outer")
        .select(
            "tok",
            (F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(F.col("d"), F.lit(0))).alias("n"),
        )
        .filter(F.col("n") > 0)
        .collect()
    }
    rebuilt = {r["tok"]: r["cnt"] for r in counts(t.read()).collect()}
    assert refreshed == rebuilt
    assert refreshed == {"alpha": 2, "beta": 3, "epsilon": 1}


def test_change_feed_with_map_column(spark, tmp_path):
    """The rewrite-fallback diff must work on tables carrying MAP columns
    (the memories table's metadata) — Spark bans set ops on maps, so the
    feed diffs through a sorted-entries encoding and decodes back."""
    sch = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        ]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "mapcdf"), sch)
    t.append(
        spark.createDataFrame([("a", {"k": "1", "j": "x"}), ("b", {"k": "2"})], sch)
    )
    v1 = t.current_version()
    t.delete_where(F.col("id") == "a")
    got = {
        (r["id"], tuple(sorted((r["meta"] or {}).items())), r["_change_type"])
        for r in t.changes(v1).collect()
    }
    assert got == {("a", (("j", "x"), ("k", "1")), "delete")}
    # append fast path unaffected
    t.append(spark.createDataFrame([("c", None)], sch))
    assert [r["id"] for r in t.changes(t.current_version() - 1).collect()] == ["c"]


def test_merge_upsert_txn_idempotent(spark, tmp_path):
    """merge_upsert with (txn_app, txn_id) is a recorded no-op on replay —
    the exactly-once foreachBatch+MERGE device — on BOTH the pruned and
    full-rewrite paths, and the ledger survives later commits."""
    sch = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "txm"), sch)
    t.append(spark.createDataFrame([(i, f"old{i}") for i in range(100)], sch).coalesce(1))
    ups = spark.createDataFrame([(5, "NEW"), (999, "NEW")], sch)
    t.merge_upsert(ups, ["k"], txn_app="cdc", txn_id=0)
    v_after = t.current_version()
    assert t.history()[-1]["op"] == "merge_upsert_pruned"
    # replay: same txn -> no commit, no duplicate rows
    t.merge_upsert(ups, ["k"], txn_app="cdc", txn_id=0)
    assert t.current_version() == v_after
    assert t.read().filter(F.col("k") == 5).count() == 1
    # a later batch still applies, and the ledger keeps the max id
    t.merge_upsert(spark.createDataFrame([(6, "B1")], sch), ["k"], txn_app="cdc", txn_id=1)
    assert t.txn_committed("cdc", 0) and t.txn_committed("cdc", 1)
    assert {r["v"] for r in t.read().filter(F.col("k").isin([5, 6, 999])).collect()} == {
        "NEW", "B1"
    }


def test_merge_upsert_composite_key_pruned(spark, tmp_path):
    """Composite keys prune too: a file is touched iff some update row's
    key TUPLE fits its per-column [min,max] box. Files disjoint on the
    first key column must survive zero-copy."""
    sch = T.StructType(
        [
            T.StructField("k1", T.LongType(), False),
            T.StructField("k2", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "ck"), sch)
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [(lo + i, i % 10, f"old{lo + i}") for i in range(100)], sch
            ).coalesce(1)
        )
    files_before = t._load_manifest(t.current_version())["files"]
    ups = spark.createDataFrame([(150, 0, "NEW"), (155, 5, "NEW"), (999, 1, "NEW")], sch)
    t.merge_upsert(ups, ["k1", "k2"])
    assert t.history()[-1]["op"] == "merge_upsert_pruned"
    files_after = set(t._load_manifest(t.current_version())["files"])
    assert len([f for f in files_before if f in files_after]) == 2  # 0-99, 200-299
    got = {(r["k1"], r["k2"]): r["v"] for r in t.read().collect()}
    assert len(got) == 301
    assert got[(150, 0)] == got[(155, 5)] == got[(999, 1)] == "NEW"
    assert got[(150, 1)] == "old150" if (150, 1) in got else True
    assert got[(151, 1)] == "old151"
    # composite rows with a NULL key component flow as inserts
    sch_n = T.StructType(
        [
            T.StructField("k1", T.LongType(), True),
            T.StructField("k2", T.LongType(), True),
            T.StructField("v", T.StringType(), True),
        ]
    )
    t.merge_upsert(spark.createDataFrame([(None, 3, "ghost")], sch_n), ["k1", "k2"])
    assert t.read().filter(F.col("v") == "ghost").count() == 1


def test_streaming_cdc_merge_exactly_once(spark, tmp_path):
    """run_versioned_cdc_merge_once: micro-batches MERGE by key as atomic
    idempotent commits; within a batch the latest row per key (by seq)
    wins; a replayed batch id is a recorded no-op."""
    from penr_oz_agent_memory_rust_spark.streaming.ingest import (
        run_versioned_cdc_merge_once,
    )

    sch = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("val", T.LongType(), True),
            T.StructField("seq", T.LongType(), True),
        ]
    )
    incoming = str(tmp_path / "cdc_in")
    t = VersionedParquetTable(spark, str(tmp_path / "cdc_lake"), sch)
    spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 11)], sch
    ).coalesce(1).write.mode("append").parquet(incoming)
    assert run_versioned_cdc_merge_once(spark, incoming, t, ["id"], seq_col="seq") == 1
    # batch 2: two updates for 'b' in ONE batch (seq 20 then 21) + insert 'c'
    spark.createDataFrame(
        [("b", 20, 20), ("b", 21, 21), ("c", 3, 22)], sch
    ).coalesce(1).write.mode("append").parquet(incoming)
    assert run_versioned_cdc_merge_once(spark, incoming, t, ["id"], seq_col="seq") == 1
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got == {"a": 1, "b": 21, "c": 3}  # latest-per-key won within the batch
    # replay batch 1's txn id directly: recorded no-op
    before = t.current_version()
    t.merge_upsert(
        spark.createDataFrame([("a", 999, 99)], sch),
        ["id"],
        txn_app="versioned-cdc-merge",
        txn_id=1,
    )
    assert t.current_version() == before and got == {
        r["id"]: r["val"] for r in t.read().collect()
    }
    # nothing new to stream: zero batches, state unchanged
    assert run_versioned_cdc_merge_once(spark, incoming, t, ["id"], seq_col="seq") == 0


def test_concurrent_appends_all_land_exactly_once(spark, tmp_path):
    """Real contention: 6 threads race zero-copy appends at the same base
    version. The hard-link commit admits exactly one winner per version;
    losers retry on the new head — every batch must land exactly once and
    the final manifest must list every file."""
    import threading

    t = VersionedParquetTable(spark, str(tmp_path / "race"), SCHEMA)
    t.ensure()
    errs = []

    def worker(i: int) -> None:
        try:
            t.append(spark.createDataFrame([(f"w{i}", i)], SCHEMA).coalesce(1))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    rows = sorted(r["id"] for r in t.read().collect())
    assert rows == [f"w{i}" for i in range(6)]
    # one commit per batch plus the create: versions are dense
    assert t.current_version() == 7
    assert [h["op"] for h in t.history()][1:] == ["append"] * 6


def test_bloom_pruned_point_deletes_on_uuid_keys(spark, tmp_path):
    """Per-file bloom sidecars make keyed mutations O(matching files)
    when the key is uuid-grade: every file's [min,max] range spans the
    whole keyspace (useless), but the bloom proves absence. A point
    delete and a point upsert must rewrite ONLY the file that actually
    holds the key."""
    import uuid as _uuid

    sch = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("val", T.LongType(), True),
        ]
    )
    t = VersionedParquetTable(
        spark, str(tmp_path / "bloomed"), sch, bloom_cols=["id"]
    )
    rng_ids = [
        [str(_uuid.UUID(int=f * 1000 + i)) for i in range(200)] for f in range(4)
    ]
    for f, ids in enumerate(rng_ids):
        t.append(
            spark.createDataFrame([(i, f) for i in ids], sch).coalesce(1)
        )
    total = len(t._load_manifest(t.current_version())["files"])
    assert total == 4
    # ranges are useless: every file overlaps a probe key's range test,
    # but prune_files_by_keys narrows to the ONE holding file
    target = rng_ids[2][50]
    keep, tot = t.prune_files_by_keys("id", [target])
    assert tot == 4 and len(keep) == 1
    # point DELETE rewrites only that file
    before = set(t._load_manifest(t.current_version())["files"])
    t.delete_keys([target], "id")
    assert t.history()[-1]["op"] == "delete_keys_pruned"
    after = set(t._load_manifest(t.current_version())["files"])
    assert len(before & after) == 3
    assert t.read().filter(F.col("id") == target).count() == 0
    assert t.read().count() == 799
    # point UPSERT rewrites only the holding file (plus the new row)
    target2 = rng_ids[0][7]
    before = set(t._load_manifest(t.current_version())["files"])
    t.merge_upsert(spark.createDataFrame([(target2, 999)], sch), ["id"])
    assert t.history()[-1]["op"] == "merge_upsert_pruned"
    after = set(t._load_manifest(t.current_version())["files"])
    assert len(before & after) == 3
    got = {r["id"]: r["val"] for r in t.read().filter(F.col("id") == target2).collect()}
    assert got == {target2: 999}
    # a key in NO file: bloom proves absence everywhere, delete is a no-op
    v = t.current_version()
    t.delete_keys([str(_uuid.UUID(int=10**9))], "id")
    assert t.current_version() == v
    # vacuum reclaims the dead files' bloom sidecars with them
    import glob as _g

    n_blooms_before = len(_g.glob(str(tmp_path / "bloomed" / "_blooms" / "*")))
    t.vacuum(keep_last=1)
    n_blooms_after = len(_g.glob(str(tmp_path / "bloomed" / "_blooms" / "*")))
    assert n_blooms_after < n_blooms_before
    # and the table still answers correctly
    assert t.read().count() == 799


def test_bloom_distributed_build_matches_driver_build(spark, tmp_path):
    """Above the driver-build row threshold the bloom bitmaps are built
    on EXECUTORS (one applyInPandas group per file); both paths share one
    hash definition, so a table built either way must answer the same
    membership queries."""
    sch = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("val", T.LongType(), True),
        ]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "dbloom"), sch, bloom_cols=["id"])
    t._BLOOM_DRIVER_BUILD_MAX_ROWS = 0  # force the executor path
    for f in range(3):
        t.append(
            spark.createDataFrame(
                [(f"k{f}_{i}", f) for i in range(300)], sch
            ).coalesce(1)
        )
    keep, tot = t.prune_files_by_keys("id", ["k1_250"])
    assert tot == 3 and len(keep) == 1
    before = set(t._load_manifest(t.current_version())["files"])
    t.delete_keys(["k1_250"], "id")
    after = set(t._load_manifest(t.current_version())["files"])
    assert len(before & after) == 2
    assert t.read().count() == 899
    assert t.read().filter(F.col("id") == "k1_250").count() == 0


def test_read_pruned_keys_point_lookup(spark, tmp_path):
    sch = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("val", T.LongType(), True),
        ]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "ptread"), sch, bloom_cols=["id"])
    for f in range(3):
        t.append(
            spark.createDataFrame([(f"g{f}_{i}", f) for i in range(100)], sch).coalesce(1)
        )
    df = t.read_pruned_keys("id", ["g1_42"])
    # only the holding file is scanned, and the row is found
    assert len(df.inputFiles()) == 1
    assert df.filter(F.col("id") == "g1_42").count() == 1
    # absent key: bloom proves absence -> empty relation, zero files
    df2 = t.read_pruned_keys("id", ["nope"])
    assert df2.count() == 0


def test_truncated_bloom_sidecar_is_ignored(spark, tmp_path):
    """A crash/disk-full-truncated sidecar must never produce a false
    NEGATIVE: lookups treat any sidecar shorter than the 128-byte floor
    as absent (answer True), so pruned mutations still visit the file."""
    sch = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("val", T.LongType(), True),
        ]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "tb"), sch, bloom_cols=["id"])
    # 200 rows * 16 bits/row = 400 bytes — safely above the 128-byte floor,
    # so the over-floor truncation case below is meaningful
    t.append(spark.createDataFrame([(f"k{i}", i) for i in range(200)], sch).coalesce(1))
    rel = t._load_manifest(t.current_version())["files"][0]
    good = open(t._bloom_path(rel, "id"), "rb").read()  # intact sidecar
    with open(t._bloom_path(rel, "id"), "wb") as f:
        f.write(b"\x00" * 7)  # simulate a torn write (pre-atomic-rename era)
    t._bloom_cache.clear()
    assert t._bloom_may_contain_any(rel, "id", ["k7"]) is True
    df = t.read_pruned_keys("id", ["k7"])
    assert df.filter(F.col("id") == "k7").count() == 1
    # and no stray .tmp files linger from the atomic writer
    import glob as _g

    assert not _g.glob(str(tmp_path / "tb" / "_blooms" / "*.tmp.*"))
    # a sidecar truncated ABOVE the 128-byte floor (legacy torn write,
    # partial copy/restore) must also read as absent: the byte length is
    # validated against the m_bits the data file's row count implies, so
    # a wrong-length bloom can never mis-hash into a false negative
    # (r6 advisor)
    assert len(good) >= 256
    with open(t._bloom_path(rel, "id"), "wb") as f:
        f.write(good[: len(good) // 2])  # >=128 bytes, wrong length
    t._bloom_cache.clear()
    assert t._bloom_bytes(rel, "id") is None
    assert t._bloom_may_contain_any(rel, "id", ["k7"]) is True
    assert t.read_pruned_keys("id", ["k7"]).filter(F.col("id") == "k7").count() == 1
    # restore the intact sidecar: the exact expected length is accepted
    with open(t._bloom_path(rel, "id"), "wb") as f:
        f.write(good)
    t._bloom_cache.clear()
    assert t._bloom_bytes(rel, "id") is not None


def test_txn_pair_must_be_complete(spark, tmp_path):
    """txn_app without txn_id (or vice versa) is always a caller bug:
    fail fast with ValueError instead of a TypeError deep in
    txn_committed's manifest scan."""
    import pytest

    sch = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "txnp"), sch)
    df = spark.createDataFrame([(1, "a")], sch)
    with pytest.raises(ValueError, match="together"):
        t.append(df, txn_app="app")
    with pytest.raises(ValueError, match="together"):
        t.append(df, txn_id=7)
    with pytest.raises(ValueError, match="together"):
        t.merge_upsert(df, ["k"], txn_app="app")
    with pytest.raises(ValueError, match="together"):
        t.merge_upsert(df, ["k"], txn_id=7)
    # complete pairs still work on both paths
    t.append(df, txn_app="app", txn_id=1)
    t.merge_upsert(spark.createDataFrame([(1, "b")], sch), ["k"], txn_app="app", txn_id=2)
    assert t.read().count() == 1


def test_row_count_from_manifest_and_auto_compact(spark, tmp_path):
    """COUNT(*) answers from the manifest's per-file "::rows" entries
    with zero data I/O, stays exact across append / pruned merge /
    keyed delete / optimize; auto_compact fires only past the file
    threshold and preserves contents."""
    sch = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "rc"), sch)
    for lo in (0, 100, 200):
        t.append(spark.createDataFrame([(lo + i, "x") for i in range(100)], sch).coalesce(2))
    assert t.row_count() == 300 and t.count_rows() == 300
    t.merge_upsert(spark.createDataFrame([(5, "N"), (999, "N")], sch), ["k"])
    assert t.row_count() == 301
    t.delete_keys([0, 1, 999], "k")
    assert t.row_count() == 298 == t.read().count()
    t.optimize()
    assert t.row_count() == 298
    # time travel: the count is per-version
    assert t.row_count(version=2) == 100
    # auto_compact: below threshold no-op, above it compacts
    n_files = len(t._load_manifest(t.current_version())["files"])
    assert t.auto_compact(max_files=64) is False
    for i in range(6):
        t.append(spark.createDataFrame([(5000 + i, "y")], sch).coalesce(1))
    assert t.auto_compact(max_files=4, n_files=2) is True
    assert len(t._load_manifest(t.current_version())["files"]) <= 2
    assert t.row_count() == 304 == t.read().count()


def test_streaming_ingest_with_auto_compact_policy(spark, tmp_path):
    """The lakehouse steady state: micro-batches accrete one file-set per
    commit; auto_compact folds them once past the threshold, without
    breaking exactly-once (txn ledger carries across the compaction) or
    the manifest row count."""
    from penr_oz_agent_memory_rust_spark.streaming.ingest import (
        run_versioned_table_ingest_once,
    )

    incoming = str(tmp_path / "in")
    t = VersionedParquetTable(spark, str(tmp_path / "lk"), SCHEMA)
    for b in range(5):
        spark.createDataFrame([(f"b{b}_{i}", b) for i in range(20)], SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(incoming)
        run_versioned_table_ingest_once(spark, incoming, t)
    n_files_before = len(t._load_manifest(t.current_version())["files"])
    assert n_files_before >= 5
    assert t.auto_compact(max_files=3, n_files=1) is True
    assert len(t._load_manifest(t.current_version())["files"]) == 1
    assert t.row_count() == 100 == t.read().count()
    # exactly-once survives the compaction: replaying an old batch id is
    # still a no-op
    v = t.current_version()
    t.append(
        spark.createDataFrame([("dup", 0)], SCHEMA), txn_app="versioned-ingest", txn_id=0
    )
    assert t.current_version() == v and t.row_count() == 100


def test_follow_versioned_changes_consumer(spark, tmp_path):
    """The generalized CDF consumer: per-consumer progress watermark,
    catch-up spans, no-op when current, and independent consumers."""
    from pyspark.sql import functions as F

    from penr_oz_agent_memory_rust_spark.streaming.ingest import (
        follow_versioned_changes,
    )

    t = VersionedParquetTable(spark, str(tmp_path / "follow"), SCHEMA)
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    seen: list[tuple[int, int, int]] = []

    def apply(df, lo, hi):
        seen.append((lo, hi, df.count()))

    assert follow_versioned_changes(t, "idx1", apply) == 1  # v1 -> v2
    assert follow_versioned_changes(t, "idx1", apply) == 0  # caught up
    t.append(spark.createDataFrame([("c", 3)], SCHEMA))
    t.delete_where(F.col("id") == "a")
    # one catch-up span covering both commits (net: +c, -a)
    assert follow_versioned_changes(t, "idx1", apply) == 2
    assert seen[0] == (1, 2, 2) and seen[-1][2] == 2
    # a second consumer starts from retained history independently
    seen2 = []
    assert follow_versioned_changes(t, "idx2", lambda d, lo, hi: seen2.append(d.count())) == 3
    assert seen2 == [2]  # net state: b, c


def test_follow_changes_gap_raises_and_resyncs(spark, tmp_path):
    """A lagging consumer whose watermark predates the vacuum window hit
    an unrecoverable gap: the default raises (no silent loss — Delta CDF
    semantics), and on_gap="resync" rebuilds from the full snapshot with
    from_v=None signalling discard-and-rebuild."""
    import pytest

    from penr_oz_agent_memory_rust_spark.streaming.ingest import (
        ChangeFeedGapError,
        follow_versioned_changes,
    )

    t = VersionedParquetTable(spark, str(tmp_path / "fv"), SCHEMA)
    t.append(spark.createDataFrame([("a", 1)], SCHEMA))
    assert follow_versioned_changes(t, "lag", lambda d, lo, hi: None) == 1
    t.append(spark.createDataFrame([("b", 2)], SCHEMA))
    t.append(spark.createDataFrame([("c", 3)], SCHEMA))
    t.vacuum(keep_last=1)  # drops every manifest the watermark points at
    with pytest.raises(ChangeFeedGapError):
        follow_versioned_changes(t, "lag", lambda d, lo, hi: None)
    # resync: full snapshot as inserts, from_v=None, watermark advances
    got = []
    adv = follow_versioned_changes(
        t,
        "lag",
        lambda d, lo, hi: got.append((lo, hi, d.count(), d.filter("_change_type = 'insert'").count())),
        on_gap="resync",
    )
    assert adv > 0
    assert got == [(None, t.current_version(), 3, 3)]
    # caught up afterwards — no replay, no second rebuild
    assert follow_versioned_changes(t, "lag", lambda d, lo, hi: None) == 0


def test_follow_changes_fresh_consumer_after_vacuum(spark, tmp_path):
    """A consumer CREATED after a vacuum must see the base snapshot's rows
    (they never appear in changes(oldest, ...)): the bootstrap unions
    snapshot(oldest)-as-inserts with the live change feed."""
    from penr_oz_agent_memory_rust_spark.streaming.ingest import (
        follow_versioned_changes,
    )

    t = VersionedParquetTable(spark, str(tmp_path / "fvf"), SCHEMA)
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    t.vacuum(keep_last=1)  # oldest retained snapshot now holds a, b
    t.append(spark.createDataFrame([("c", 3)], SCHEMA))
    got = []
    adv = follow_versioned_changes(
        t, "newidx", lambda d, lo, hi: got.append(sorted(r["id"] for r in d.collect()))
    )
    assert adv >= 1
    assert got == [["a", "b", "c"]]
    assert follow_versioned_changes(t, "newidx", lambda d, lo, hi: None) == 0


def test_merge_upsert_over_cap_into_empty_table(spark, tmp_path):
    """r5 bench regression: the FIRST CDC batch can carry more distinct
    keys than the collect cap while the table has zero files — the
    over-cap branch must not build a zero-row ranges frame (schema
    inference error); the whole batch just lands as inserts."""
    sch = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "em"), sch, merge_key_cap=5)
    ups = spark.createDataFrame([(i, f"v{i}") for i in range(50)], sch)
    t.merge_upsert(ups, ["k"])  # 50 distinct keys >> cap of 5, empty base
    assert t.read().count() == 50
    # composite keys into an empty table too
    sch2 = T.StructType(
        [
            T.StructField("k1", T.LongType(), False),
            T.StructField("k2", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    t2 = VersionedParquetTable(spark, str(tmp_path / "em2"), sch2)
    t2.merge_upsert(
        spark.createDataFrame([(1, 2, "a"), (3, 4, "b")], sch2), ["k1", "k2"]
    )
    assert t2.read().count() == 2


def test_bloom_skips_unsafe_key_types(spark, tmp_path):
    """Float keys are excluded from bloom builds: driver and executor
    builds format values differently (repr vs Spark's string cast), and
    a drifted hash would manifest as silently-lost rows. The table must
    keep working with NO bloom (range path) rather than a wrong one."""
    sch = T.StructType(
        [
            T.StructField("fk", T.DoubleType(), False),
            T.StructField("v", T.LongType(), True),
        ]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "fb"), sch, bloom_cols=["fk"])
    t.append(spark.createDataFrame([(1e-07, 1), (2.5, 2)], sch).coalesce(1))
    import glob as _g

    assert _g.glob(str(tmp_path / "fb" / "_blooms" / "*")) == []  # none built
    t.delete_keys([1e-07], "fk")
    assert {r["v"] for r in t.read().collect()} == {2}


def test_history_reports_row_counts(spark, table):
    table.append(spark.createDataFrame([("c", 3)], SCHEMA))
    table.delete_where(F.col("id") == "a")
    h = table.history()
    assert [r["n_rows"] for r in h] == [0, 2, 3, 2]
    assert all("n_files" in r and "op" in r for r in h)
