"""Persisted IVF index: build, partition-pruned search, recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import ivf_index, memory_store
from penr_oz_agent_memory_rust_spark.plans import explain
from penr_oz_agent_memory_rust_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "emb_index")
    corpus = load_table(spark, sf_dir, "embeddings")
    cents = ivf_index.build_ivf_index(corpus, path, n_centroids=8, n_iters=3)
    assert cents.shape == (8, 64)
    return path


def test_index_layout_partitioned_by_cell(spark, index_path):
    import os

    cells = [d for d in os.listdir(f"{index_path}/data") if d.startswith("ivf_cell=")]
    assert len(cells) >= 2  # data actually spread over cells
    assert os.path.exists(f"{index_path}/centroids.json")


def test_search_prunes_partitions(spark, sf_dir, index_path):
    qv = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).first()["embedding"]
    df = ivf_index.search_ivf_index(spark, index_path, list(qv), k=5, n_probes=2)
    plan = explain.physical_plan(df)
    # the probe filter must land in PartitionFilters (pruning), not a post-scan Filter
    assert "PartitionFilters" in plan
    part_section = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "ivf_cell" in part_section, part_section


def test_incremental_append_searchable(spark, sf_dir, tmp_path):
    """append_to_ivf_index: new vectors land in existing cells and are
    immediately findable without retraining."""
    import numpy as np

    path = str(tmp_path / "inc_idx")
    corpus = load_table(spark, sf_dir, "embeddings")
    ivf_index.build_ivf_index(corpus, path, n_centroids=4, n_iters=2)
    # a fresh, distinctive vector
    new_vec = [float(x) for x in np.eye(64, dtype=np.float32)[0]]
    new_rows = spark.createDataFrame(
        [(999999, new_vec, 0)], "vec_id bigint, embedding array<float>, label int"
    )
    ivf_index.append_to_ivf_index(new_rows, path)
    hits = ivf_index.search_ivf_index(spark, path, new_vec, k=1, n_probes=1).collect()
    assert hits[0]["vec_id"] == 999999 and abs(hits[0]["score"] - 1.0) < 1e-5


def test_batch_search_matches_single_query_path(spark, sf_dir, index_path):
    """search_ivf_index_batch over a 1-row query side must agree with the
    single-query search on the same persisted index (same probes, same
    exact scoring inside the probed cells)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = list(emb.filter(F.col("vec_id") == 3).first()["embedding"])
    single = [r["vec_id"] for r in
              ivf_index.search_ivf_index(spark, index_path, qv, k=5, n_probes=2).collect()]
    q = emb.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    batch = [r["vec_id"] for r in
             ivf_index.search_ivf_index_batch(
                 spark, index_path, q, k=5, n_probes=2
             ).sort(F.desc("score"), "vec_id").collect()]
    assert set(single) == set(batch)


def test_batch_search_prunes_partitions(spark, sf_dir, index_path):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    df = ivf_index.search_ivf_index_batch(spark, index_path, q, k=2, n_probes=1)
    plan = explain.physical_plan(df)
    assert "PartitionFilters" in plan
    part_section = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "ivf_cell" in part_section, part_section


def test_table_compaction(spark, tmp_path):
    from penr_oz_agent_memory_rust_spark.schemas import SESSIONS_SCHEMA
    from penr_oz_agent_memory_rust_spark.sources.tables import ParquetTable
    import datetime as dt
    import glob

    t = ParquetTable(spark, str(tmp_path / "many"), SESSIONS_SCHEMA)
    t0 = dt.datetime(2026, 1, 1)
    for i in range(5):  # five appends -> many small files
        t.append(spark.createDataFrame([(f"s{i}", t0, t0, None)], SESSIONS_SCHEMA))
    before = t.compact(target_partitions=1)
    after = len(glob.glob(f"{t.path}/**/*.parquet", recursive=True))
    assert before >= 5 and after == 1
    assert t.read().count() == 5


def test_search_recall_and_self_match(spark, sf_dir, index_path):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    got = ivf_index.search_ivf_index(spark, index_path, qv, k=5, n_probes=3).collect()
    assert got[0]["vec_id"] == 0 and abs(got[0]["score"] - 1.0) < 1e-5
    # recall vs exact brute force over the full corpus
    mem = emb.select(
        F.col("vec_id").cast("string").alias("id"),
        F.lit("t").alias("text"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.lit(None).cast("string").alias("session"),
        F.col("embedding"),
        F.lit(None).cast("timestamp").alias("created_at"),
    )
    exact = {int(r["id"]) for r in memory_store.search(mem, qv, limit=5).collect()}
    approx = {r["vec_id"] for r in got}
    assert len(exact & approx) / len(exact) >= 0.4


def test_streaming_append_equals_batch_build(spark, sf_dir, tmp_path):
    """search-after-STREAMED-append == one-shot batch build with the same
    centroids: the streamed index holds exactly the same (cell, row) sets,
    and a re-run of the availableNow job is a no-op (checkpointed files
    are never reprocessed)."""
    import os

    from penr_oz_agent_memory_rust_spark.streaming.ingest import run_ivf_append_once

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)

    streamed = str(tmp_path / "streamed")
    ivf_index.build_ivf_index(base, streamed, n_centroids=4, n_iters=3)
    incoming = str(tmp_path / "incoming")
    rest.write.parquet(incoming)
    n1 = run_ivf_append_once(spark, incoming, streamed)
    assert n1 >= 1

    # batch twin: same centroids (sidecar copy), all rows assigned at once
    batch = str(tmp_path / "batch")
    os.makedirs(batch)
    import shutil

    shutil.copy(
        os.path.join(streamed, "centroids.json"), os.path.join(batch, "centroids.json")
    )
    ivf_index.append_to_ivf_index(emb, batch)

    def snap(path):
        return {
            (r["ivf_cell"], r["vec_id"])
            for r in spark.read.parquet(os.path.join(path, "data"))
            .select("ivf_cell", "vec_id")
            .collect()
        }

    assert snap(streamed) == snap(batch)
    # searches agree exactly (same cells, same vectors)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    s1 = ivf_index.search_ivf_index(spark, streamed, qv, k=7, n_probes=4).collect()
    s2 = ivf_index.search_ivf_index(spark, batch, qv, k=7, n_probes=4).collect()
    assert [(r["vec_id"], r["score"]) for r in s1] == [
        (r["vec_id"], r["score"]) for r in s2
    ]
    # idempotence: draining the same inbox again appends nothing
    before = spark.read.parquet(os.path.join(streamed, "data")).count()
    run_ivf_append_once(spark, incoming, streamed)
    assert spark.read.parquet(os.path.join(streamed, "data")).count() == before


def test_compact_streamed_index(spark, sf_dir, tmp_path):
    """After N micro-batch appends each cell dir holds N+1 files; compaction
    rewrites to one file per cell with identical search results."""
    import glob
    import os

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    path = str(tmp_path / "ix")
    ivf_index.build_ivf_index(
        emb.filter(F.col("vec_id") < 100), path, n_centroids=4, n_iters=2
    )
    for lo in (100, 200):
        ivf_index.append_to_ivf_index(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 100)), path
        )
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    before_hits = ivf_index.search_ivf_index(spark, path, qv, k=5, n_probes=4).collect()
    stats = ivf_index.compact_ivf_index(spark, path)
    assert stats["files_after"] < stats["files_before"]
    # exactly one file per cell directory
    for cell_dir in glob.glob(os.path.join(path, "data", "ivf_cell=*")):
        assert len(glob.glob(os.path.join(cell_dir, "*.parquet"))) == 1, cell_dir
    after_hits = ivf_index.search_ivf_index(spark, path, qv, k=5, n_probes=4).collect()
    assert [(r["vec_id"], r["score"]) for r in before_hits] == [
        (r["vec_id"], r["score"]) for r in after_hits
    ]


def test_snapshot_and_rollback_restore_exact_results(spark, sf_dir, tmp_path):
    from penr_oz_agent_memory_rust_spark.operators import ivf_index

    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    path = str(tmp_path / "ivf")
    ivf_index.build_ivf_index(emb, path, n_centroids=4, n_iters=2)
    q = [r.embedding for r in emb.limit(1).collect()][0]
    before = [
        (r.vec_id, r.score)
        for r in ivf_index.search_ivf_index(spark, path, q, k=5, n_probes=4).collect()
    ]
    m1 = ivf_index.snapshot_ivf_index(path, tag="pre-append")
    assert m1["version"] == 1 and len(m1["files"]) > 0

    # mutate the live index: append new rows, then compact (rewrites files)
    extra = load_table(spark, sf_dir, "embeddings").limit(400).filter(
        F.col("vec_id") >= 300
    )
    ivf_index.append_to_ivf_index(extra, path)
    ivf_index.compact_ivf_index(spark, path)
    mutated = [
        (r.vec_id, r.score)
        for r in ivf_index.search_ivf_index(spark, path, q, k=5, n_probes=4).collect()
    ]

    restored_manifest = ivf_index.rollback_ivf_index(path, 1)
    assert restored_manifest["version"] == 1
    after = [
        (r.vec_id, r.score)
        for r in ivf_index.search_ivf_index(spark, path, q, k=5, n_probes=4).collect()
    ]
    assert after == before
    # snapshots survive rollback and can be listed
    assert [m["version"] for m in ivf_index.list_ivf_snapshots(path)] == [1]
    assert mutated != before or len(mutated) == len(before)


def test_snapshot_survives_compaction_inode_reuse(spark, sf_dir, tmp_path):
    """Compaction rewrites/deletes live files; the snapshot's hardlinks
    must keep the original bytes readable."""
    from penr_oz_agent_memory_rust_spark.operators import ivf_index

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    path = str(tmp_path / "ivf2")
    ivf_index.build_ivf_index(emb, path, n_centroids=2, n_iters=2)
    ivf_index.snapshot_ivf_index(path)
    ivf_index.append_to_ivf_index(
        load_table(spark, sf_dir, "embeddings").limit(250).filter(F.col("vec_id") >= 200),
        path,
    )
    ivf_index.compact_ivf_index(spark, path)
    import os

    snap_data = os.path.join(path, "snapshots", "v0001", "data")
    n = spark.read.parquet(snap_data).count()
    assert n == 200


def test_takedown_removes_victims_rewrites_only_matched_files(spark, sf_dir, tmp_path):
    """remove_from_ivf_index (r9 verdict ask #2): victims stop being
    retrievable, survivors are untouched, and the rewrite cost is
    O(matched files) — untouched files in touched cells are HARDLINKED
    (same inode), clean cells never move."""
    import glob
    import os

    emb = load_table(spark, sf_dir, "embeddings").limit(400)
    path = str(tmp_path / "ivf_td")
    ivf_index.build_ivf_index(emb, path, n_centroids=4, n_iters=2)
    # several files per cell so "only matched files rewritten" is observable
    for lo in (400, 450):  # embeddings sf0.001 carries vec_id 0..499
        ivf_index.append_to_ivf_index(
            load_table(spark, sf_dir, "embeddings")
            .filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 50)),
            path,
        )
    data = os.path.join(path, "data")
    files_before = {
        f: os.stat(f).st_ino
        for f in glob.glob(os.path.join(data, "**", "*.parquet"), recursive=True)
    }
    n_before = spark.read.parquet(data).count()
    victims = [0, 1, 2, 410, 470]
    victim_vec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    out = ivf_index.remove_from_ivf_index(spark, path, victims)
    assert out["docs_removed"] == len(victims)
    assert 0 < out["files_rewritten"] < len(files_before)
    # victims unreachable: full scan AND probe-limited search
    post = spark.read.parquet(data)
    assert post.filter(F.col("vec_id").isin(victims)).count() == 0
    assert post.count() == n_before - len(victims)
    hits = ivf_index.search_ivf_index(
        spark, path, list(victim_vec), k=5, n_probes=4
    ).collect()
    assert all(h["vec_id"] != 0 for h in hits)
    # unmatched files in touched cells kept their inode (hardlink, no copy)
    files_after = {
        f: os.stat(f).st_ino
        for f in glob.glob(os.path.join(data, "**", "*.parquet"), recursive=True)
    }
    preserved = set(files_before) & set(files_after)
    assert preserved and all(files_before[f] == files_after[f] for f in preserved)
    assert len(preserved) == len(files_before) - out["files_rewritten"]
    # no staging residue
    assert not any(
        os.path.exists(os.path.join(path, d))
        for d in ("takedown-old", "takedown-staging-cells", "takedown-staging-rewrite")
    )
    # replay after completion is a no-op
    again = ivf_index.remove_from_ivf_index(spark, path, victims)
    assert again == {"docs_removed": 0, "files_rewritten": 0,
                     "files_relinked": 0, "cells_touched": 0}


def test_takedown_crash_replay_converges(spark, sf_dir, tmp_path, monkeypatch):
    """Injected failure in the swap phase: crash after the victim cell is
    parked but before the staged replacement is promoted (the worst
    window — the cell is MISSING from the live index). The replay must
    roll the interrupted swap forward and finish the takedown with no
    survivor lost and no victim left."""
    import os

    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    path = str(tmp_path / "ivf_crash")
    ivf_index.build_ivf_index(emb, path, n_centroids=4, n_iters=2)
    data = os.path.join(path, "data")
    n_before = spark.read.parquet(data).count()
    victims = [5, 6, 7]

    real_rename = os.rename
    calls = {"n": 0}

    def crashing_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # after park #1, before promote #1
            raise OSError("injected crash mid-swap")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", crashing_rename)
    import pytest as _pytest

    with _pytest.raises(OSError, match="injected"):
        ivf_index.remove_from_ivf_index(spark, path, victims)
    monkeypatch.setattr(os, "rename", real_rename)
    # intermediate state: one cell parked (missing live), staged exists
    assert os.path.isdir(os.path.join(path, "takedown-old"))
    # replay converges
    out = ivf_index.remove_from_ivf_index(spark, path, victims)
    post = spark.read.parquet(data)
    assert post.filter(F.col("vec_id").isin(victims)).count() == 0
    assert post.count() == n_before - len(victims)
    assert out["docs_removed"] >= 1  # the replay finished the remainder
    assert not os.path.exists(os.path.join(path, "takedown-old"))
    # second replay: clean no-op
    assert ivf_index.remove_from_ivf_index(spark, path, victims)["docs_removed"] == 0


def test_takedown_crash_before_any_swap_rolls_back_clean(spark, sf_dir, tmp_path, monkeypatch):
    """Crash during staging (before any live dir moves): the live index
    is untouched; recovery just clears staging and the replay runs the
    whole takedown."""
    import os

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    path = str(tmp_path / "ivf_crash2")
    ivf_index.build_ivf_index(emb, path, n_centroids=2, n_iters=2)
    data = os.path.join(path, "data")
    n_before = spark.read.parquet(data).count()

    real_link = os.link
    def crashing_link(src, dst):
        raise OSError("injected crash during staging")

    monkeypatch.setattr(os, "link", crashing_link)
    import pytest as _pytest

    with _pytest.raises(OSError, match="injected"):
        ivf_index.remove_from_ivf_index(spark, path, [3, 4])
    monkeypatch.setattr(os, "link", real_link)
    # live index untouched by the failed staging
    assert spark.read.parquet(data).count() == n_before
    out = ivf_index.remove_from_ivf_index(spark, path, [3, 4])
    assert out["docs_removed"] == 2
    assert spark.read.parquet(data).count() == n_before - 2


def test_takedown_whole_cell_and_snapshot_purge(spark, sf_dir, tmp_path):
    """(a) removing EVERY id of a cell leaves no stray partition dir;
    (b) snapshots keep the victims (immutable history, hardlinked
    inodes) until purge_ivf_snapshots rewrites them — after which the
    victims are gone from history too, survivors intact, manifest
    consistent, and a purge replay is a no-op."""
    import glob
    import os

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    path = str(tmp_path / "ivf_purge")
    ivf_index.build_ivf_index(emb, path, n_centroids=2, n_iters=2)
    data = os.path.join(path, "data")
    snap = ivf_index.snapshot_ivf_index(path, tag="pre-takedown")
    # victim set = one entire cell + one id from the other
    cells = sorted(
        r["ivf_cell"]
        for r in spark.read.parquet(data).select("ivf_cell").distinct().collect()
    )
    cell_ids = [
        r["vec_id"]
        for r in spark.read.parquet(data)
        .filter(F.col("ivf_cell") == cells[0])
        .select("vec_id")
        .collect()
    ]
    other_id = (
        spark.read.parquet(data)
        .filter(F.col("ivf_cell") == cells[1])
        .select("vec_id")
        .first()["vec_id"]
    )
    victims = cell_ids + [other_id]
    out = ivf_index.remove_from_ivf_index(spark, path, victims)
    assert out["docs_removed"] == len(victims)
    assert not os.path.exists(os.path.join(data, f"ivf_cell={cells[0]}"))
    live = spark.read.parquet(data)
    assert live.count() == 200 - len(victims)
    # history still has them (immutability is the snapshot contract)...
    sdata = os.path.join(path, "snapshots", "v0001", "data")
    assert (
        spark.read.parquet(sdata).filter(F.col("vec_id").isin(victims)).count()
        == len(victims)
    )
    # ...until the erasure pass
    purged = ivf_index.purge_ivf_snapshots(spark, path, victims)
    assert purged["snapshots_touched"] == 1 and purged["files_rewritten"] >= 1
    with open(os.path.join(path, "snapshots", "v0001", "manifest.json")) as f:
        manifest = __import__("json").load(f)
    on_disk = {
        os.path.relpath(f, sdata)
        for f in glob.glob(os.path.join(sdata, "**", "*.parquet"), recursive=True)
    }
    assert set(manifest["files"]) == on_disk  # manifest matches disk exactly
    snap_rows = spark.read.parquet(sdata)
    assert snap_rows.filter(F.col("vec_id").isin(victims)).count() == 0
    assert snap_rows.count() == 200 - len(victims)
    # purge replay: converged no-op
    again = ivf_index.purge_ivf_snapshots(spark, path, victims)
    assert again["files_rewritten"] == 0 and again["orphans_gced"] == 0


def test_ivfpq_takedown_delegates(spark, sf_dir, tmp_path):
    """remove_from_ivfpq_index: a taken-down vector stops appearing in
    ADC search of the persisted codes table."""
    from penr_oz_agent_memory_rust_spark.operators import ivfpq

    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    path = str(tmp_path / "ivfpq_td")
    ivfpq.build_ivfpq_index(emb, path, n_cells=4, m=8, ksub=16, n_iters=3)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 10).first()["embedding"]]
    before = ivfpq.search_ivfpq_index(spark, path, qv, k=3, n_probes=4).collect()
    assert before[0]["vec_id"] == 10  # self-match under ADC
    out = ivfpq.remove_from_ivfpq_index(spark, path, [10])
    assert out["docs_removed"] == 1
    after = ivfpq.search_ivfpq_index(spark, path, qv, k=3, n_probes=4).collect()
    assert all(h["vec_id"] != 10 for h in after)


def test_purge_crash_before_manifest_swap_replays_clean(spark, sf_dir, tmp_path, monkeypatch):
    """Purge crash window 1: replacement file written + renamed in, crash
    BEFORE the manifest swap. The replay's orphan GC must remove the
    unreferenced replacement (manifest is the sole source of truth),
    re-rewrite from the intact originals, and converge with no survivor
    duplicated and no victim left."""
    import os

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    path = str(tmp_path / "ivf_purge_crash1")
    ivf_index.build_ivf_index(emb, path, n_centroids=2, n_iters=2)
    ivf_index.snapshot_ivf_index(path)
    victims = [1, 2, 3]

    real_replace = os.replace
    def crashing_replace(src, dst):
        if dst.endswith("manifest.json"):
            raise OSError("injected crash before manifest swap")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crashing_replace)
    import pytest as _p

    with _p.raises(OSError, match="injected"):
        ivf_index.purge_ivf_snapshots(spark, path, victims)
    monkeypatch.setattr(os, "replace", real_replace)
    out = ivf_index.purge_ivf_snapshots(spark, path, victims)
    assert out["orphans_gced"] >= 1  # the unreferenced replacement
    sdata = os.path.join(path, "snapshots", "v0001", "data")
    snap = spark.read.parquet(sdata)
    assert snap.filter(F.col("vec_id").isin(victims)).count() == 0
    assert snap.count() == 200 - len(victims)  # survivors never duplicated
    again = ivf_index.purge_ivf_snapshots(spark, path, victims)
    assert again["files_rewritten"] == 0 and again["orphans_gced"] == 0


def test_purge_crash_after_manifest_swap_gc_completes_erasure(spark, sf_dir, tmp_path, monkeypatch):
    """Purge crash window 2: manifest swapped to the replacements, crash
    BEFORE the victim-bearing originals are unlinked. The replay's GC
    must unlink the now-orphaned originals — completing the erasure —
    with zero re-rewrites (the manifest's files are already clean)."""
    import glob
    import os

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    path = str(tmp_path / "ivf_purge_crash2")
    ivf_index.build_ivf_index(emb, path, n_centroids=2, n_iters=2)
    ivf_index.snapshot_ivf_index(path)
    victims = [5, 6]

    real_remove = os.remove
    def crashing_remove(p):
        raise OSError("injected crash before original unlink")

    monkeypatch.setattr(os, "remove", crashing_remove)
    import pytest as _p

    with _p.raises(OSError, match="injected"):
        ivf_index.purge_ivf_snapshots(spark, path, victims)
    monkeypatch.setattr(os, "remove", real_remove)
    sdata = os.path.join(path, "snapshots", "v0001", "data")
    # originals still on disk (erasure INCOMPLETE until replay)
    import json as _json

    with open(os.path.join(path, "snapshots", "v0001", "manifest.json")) as f:
        listed = set(_json.load(f)["files"])
    on_disk = {
        os.path.relpath(f, sdata)
        for f in glob.glob(os.path.join(sdata, "**", "*.parquet"), recursive=True)
    }
    assert on_disk - listed  # orphaned victim-bearing originals linger
    out = ivf_index.purge_ivf_snapshots(spark, path, victims)
    assert out["orphans_gced"] == len(on_disk - listed)
    assert out["files_rewritten"] == 0  # manifest files were already clean
    snap = spark.read.parquet(sdata)
    assert snap.filter(F.col("vec_id").isin(victims)).count() == 0
    assert snap.count() == 200 - len(victims)
