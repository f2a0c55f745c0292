"""Persisted IVF index: the batch index-building job that is this engine's
north-star workload (BASELINE.json: "batch index building fits Spark").

`build_ivf_index` writes the corpus as Parquet **partitioned by IVF cell**;
`search_ivf_index` probes only the n_probes nearest cells, which Catalyst
turns into *partition pruning at the scan* — the 100 TB search never reads
the other cells' files. This is the durable version of knn.ivf_knn_join
(which buckets on the fly): build once, search many.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from penr_oz_agent_memory_rust_spark.functions import similarity
from penr_oz_agent_memory_rust_spark.operators import knn
from penr_oz_agent_memory_rust_spark.operators.topk import top_k


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iters: int = 5,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> np.ndarray:
    """Train centroids, assign every row a cell, write partitioned by cell.

    Parquet lands under <path>/data (partitioned by cell); centroids.json
    sits BESIDE it, not inside — a non-parquet sidecar in the table root
    corrupts the file listing. Persisted centroids mean searches need no
    retraining. Assignment is the pure column expression from
    knn.ivf_assign_expr — no Python in the write path.
    """
    cents = knn.train_ivf_centroids(
        corpus, vec_col=vec_col, n_centroids=n_centroids, n_iters=n_iters,
        sample_fraction=sample_fraction, seed=seed,
    )
    indexed = corpus.withColumn("ivf_cell", knn.ivf_assign_expr(F.col(vec_col), cents))
    indexed.write.mode("overwrite").partitionBy("ivf_cell").parquet(os.path.join(path, "data"))
    _write_sidecar_atomic(os.path.join(path, "centroids.json"), cents.tolist())
    return cents


def _write_sidecar_atomic(dest: str, obj) -> None:
    """Write a JSON sidecar via tmp + os.replace — NEVER open(dest, 'w'):
    snapshots HARDLINK the live sidecar, and an in-place truncate writes
    through the shared inode, silently corrupting every snapshot's copy
    (caught by the r10 rollback-after-retrain test). replace() points the
    live name at a fresh inode; snapshot links keep the old bytes."""
    tmp = dest + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, dest)


def load_centroids(path: str) -> np.ndarray:
    with open(os.path.join(path, "centroids.json")) as f:
        return np.asarray(json.load(f), dtype=np.float32)


def append_to_ivf_index(new_rows: DataFrame, path: str, vec_col: str = "embedding") -> None:
    """Incremental index maintenance: assign new vectors to the EXISTING
    cells (no retraining — FAISS-style) and append into their partition
    directories. Centroid drift is handled by periodic build_ivf_index
    rebuilds, not per-batch retrains."""
    cents = load_centroids(path)
    indexed = new_rows.withColumn("ivf_cell", knn.ivf_assign_expr(F.col(vec_col), cents))
    indexed.write.mode("append").partitionBy("ivf_cell").parquet(os.path.join(path, "data"))


def compact_ivf_index(spark: SparkSession, path: str) -> dict:
    """Rewrite the index data so each cell partition holds ONE file — the
    OPTIMIZE job for a stream-maintained index, where every availableNow
    append leaves one small file per micro-batch per cell and
    probe-limited search degrades into a small-file listing problem.

    One shuffle: repartition on the cell column with n_cells target
    partitions lands every cell's rows in exactly one task (a hash
    collision only means one task writes two cell directories — still one
    file each), so the partitioned write emits one file per directory
    with no single-task bottleneck. The rewrite lands in a temp dir and
    swaps in with two renames — the read side never sees a
    half-compacted index. Returns {files_before, files_after, cells}."""
    import glob
    import shutil

    data = os.path.join(path, "data")
    before = len(glob.glob(os.path.join(data, "**", "*.parquet"), recursive=True))
    n_cells = max(1, len(glob.glob(os.path.join(data, "ivf_cell=*"))))
    df = spark.read.parquet(data)
    tmp = data + "__compacting"
    (
        df.repartition(n_cells, "ivf_cell")
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(tmp)
    )
    old = data + "__old"
    os.rename(data, old)
    os.rename(tmp, data)
    shutil.rmtree(old, ignore_errors=True)
    after = len(glob.glob(os.path.join(data, "**", "*.parquet"), recursive=True))
    return {"files_before": before, "files_after": after, "cells": n_cells}


def search_ivf_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Single-query probe-limited search.

    The `ivf_cell IN (...)` literal filter sits on the partition column, so
    the scan's PartitionFilters prune every non-probed cell before any file
    is opened (plan-pinned in tests/test_ivf_index.py). Scoring inside the
    probed cells is the exact §3.1 pipeline.
    """
    cents = load_centroids(path)
    q = np.asarray(query_vec, dtype=np.float32)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    order = np.argsort(-(cents @ q))
    probes = [int(c) for c in order[: min(n_probes, len(order))]]
    df = spark.read.parquet(os.path.join(path, "data")).filter(F.col("ivf_cell").isin(probes))
    scored = df.withColumn(
        "score",
        similarity.cosine_f32(F.col(vec_col), similarity.query_vec_lit([float(x) for x in query_vec])),
    ).filter(F.col("score").isNotNull())
    return top_k(scored, "score", k, tiebreak=id_col).select(id_col, "score")


def search_ivf_index_batch(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probes: int = 2,
    query_id: str = "query_id",
    query_vec: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch probe-limited search against a PERSISTED index — the
    search-many half of build-once/search-many. No retraining, no corpus
    collect: centroids come from the sidecar (k × d floats), each query
    explodes into its n_probes nearest cells, and the corpus scan is
    pruned to exactly the probed `ivf_cell=` partition directories before
    any data file is opened. The only driver-side collect is the distinct
    probe-cell list — bounded by the *request* size (≤ queries × n_probes
    ints), never by the corpus.
    """
    from penr_oz_agent_memory_rust_spark.operators.topk import top_k_per_group

    cents = load_centroids(path)
    probe_structs = []
    for j, c in enumerate(cents):
        lit_c = F.array(*[F.lit(float(x)) for x in c])
        dot = F.aggregate(
            F.zip_with(F.col(query_vec).cast("array<double>"), lit_c, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        probe_structs.append(F.struct(dot.alias("s"), F.lit(j).alias("j")))
    probes = F.slice(F.reverse(F.array_sort(F.array(*probe_structs))), 1, n_probes)
    qb = queries.withColumn("__cell", F.explode(probes.getField("j")))
    cells = [r[0] for r in qb.select("__cell").distinct().collect()]
    corpus = (
        spark.read.parquet(os.path.join(path, "data"))
        .filter(F.col("ivf_cell").isin(cells))  # partition pruning at the scan
        .withColumnRenamed("ivf_cell", "__cell")
    )
    scored = (
        corpus.join(qb, "__cell")
        .withColumn("score", knn.cosine_pairs_udf()(F.col(vec_col), F.col(query_vec)))
        .filter(F.col("score").isNotNull() & ~F.isnan(F.col("score")))
        .select(query_id, id_col, "score")
    )
    return top_k_per_group(scored, [query_id], "score", k, tiebreak=id_col)


def _uri_to_local(uri: str) -> str:
    """`_metadata.file_path` to a local filesystem path. Hadoop renders
    local URIs as `file:/root/...` today, but `file:///root/...` is the
    equally-valid RFC form — a naive prefix strip of the latter leaves
    `///root/...`, which string-compares unequal to glob results and
    would make every matched file look unmatched (hardlinked AND
    rewritten → silently duplicated survivors). Normalize both forms."""
    if uri.startswith("file:"):
        rest = uri[len("file:"):]
        return "/" + rest.lstrip("/")
    return uri


def _recover_interrupted_takedown(path: str) -> None:
    """Bring a possibly crash-interrupted takedown to a consistent state
    before (re)starting one. The swap phase only begins after EVERY
    staged cell directory is fully built, so at recovery time each
    touched cell is in exactly one of three states:

      live present            -> its swap finished (or never started);
                                 anything staged/parked for it is garbage
      live missing, staged ok -> roll FORWARD: finish the rename
      live missing, no staged -> roll BACK: restore the parked original

    After per-cell resolution every cell holds either its pre- or its
    post-takedown contents — both are safe inputs for the replay, which
    re-derives the matched set from what actually survives on disk."""
    import glob
    import shutil

    data = os.path.join(path, "data")
    old_root = os.path.join(path, "takedown-old")
    staging_cells = os.path.join(path, "takedown-staging-cells")
    if os.path.isdir(old_root):
        for parked in glob.glob(os.path.join(old_root, "ivf_cell=*")):
            cell = os.path.basename(parked)
            live = os.path.join(data, cell)
            staged = os.path.join(staging_cells, cell)
            if not os.path.exists(live):
                if os.path.isdir(staged):
                    os.rename(staged, live)
                else:
                    os.rename(parked, live)
    for d in (old_root, staging_cells, os.path.join(path, "takedown-staging-rewrite")):
        shutil.rmtree(d, ignore_errors=True)


def remove_from_ivf_index(
    spark: SparkSession,
    path: str,
    doc_ids: list,
    id_col: str = "vec_id",
) -> dict:
    """★ TAKEDOWN for a persisted cell-partitioned serving index — the
    delete half of the IVF lifecycle (build/append/compact/search/
    snapshot/rollback were the other five; r9 verdict What's-missing #1).
    GDPR / licensing / robots-retro removals arrive continuously, and the
    serving index is what an agent actually queries (reference lifecycle
    anchor: DELETE /memory/{id}, /root/reference/src/routes.rs:460-471) —
    without this, a taken-down vector stays retrievable until a full
    rebuild. The same function serves the IVF-PQ codes table
    (ivfpq.remove_from_ivfpq_index): both persist `<path>/data`
    partitioned by ivf_cell, and nothing here reads vector payloads.

    Cost is O(matched files), never O(index): the victim scan pushes
    `id IN (...)` into the parquet footers (row-group min/max stats skip
    clean files — on an id-clustered index, almost all of them) and
    collects only the matched FILE PATHS via the _metadata column; the
    rewrite job reads just those files, drops the victims, and emits one
    replacement file per touched cell (repartition on the cell column —
    the compact_ivf_index device); every untouched file in a touched
    cell is HARDLINKED into the staged cell directory, zero-copy.

    Crash-replay convergence: staging is fully built before any live
    directory moves; each cell then swaps via park(live->takedown-old) +
    promote(staged->live), and _recover_interrupted_takedown resolves
    any interrupted swap forward (staged exists) or backward (it does
    not) on the next call — replaying the takedown after a crash at ANY
    point re-derives the remaining matched files from disk and finishes.
    Concurrency contract: SINGLE-WRITER maintenance, same as
    remove_from_lsh_index; a concurrent reader during one cell's swap
    window can momentarily miss that cell (the same exposure as
    compact_ivf_index's data-dir swap, bounded per cell here).

    Snapshots are IMMUTABLE history and keep their hardlinked inodes —
    a takedown does not purge them (purge_ivf_snapshots does, for the
    right-to-erasure case where history must forget too). Returns
    {"docs_removed", "files_rewritten", "files_relinked",
    "cells_touched"}."""
    import glob
    import shutil

    doc_ids = [d for d in doc_ids if d is not None]
    data = os.path.join(path, "data")
    if not doc_ids or not os.path.isdir(data):
        return {"docs_removed": 0, "files_rewritten": 0,
                "files_relinked": 0, "cells_touched": 0}
    _recover_interrupted_takedown(path)

    victims = spark.read.parquet(data).filter(F.col(id_col).isin(doc_ids))
    pre = victims.select(
        F.col("_metadata.file_path").alias("__f"), F.col(id_col)
    ).groupBy().agg(
        F.collect_set("__f").alias("__files"),
        F.count_distinct(F.col(id_col)).alias("__n"),
    ).first()
    matched_uris, n_docs = sorted(pre["__files"] or []), int(pre["__n"])
    if not matched_uris:
        # never indexed, or a replay after a completed takedown
        return {"docs_removed": 0, "files_rewritten": 0,
                "files_relinked": 0, "cells_touched": 0}

    matched = {_uri_to_local(u) for u in matched_uris}
    touched = sorted({os.path.basename(os.path.dirname(f)) for f in matched})

    # one job: survivors of the matched files, one output file per cell
    staging_rewrite = os.path.join(path, "takedown-staging-rewrite")
    (
        spark.read.option("basePath", data)
        .parquet(*matched_uris)
        .filter(~F.col(id_col).isin(doc_ids))
        .repartition(len(touched), "ivf_cell")
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(staging_rewrite)
    )

    # stage every touched cell COMPLETELY before any swap starts
    staging_cells = os.path.join(path, "takedown-staging-cells")
    n_linked = 0
    for cell in touched:
        staged = os.path.join(staging_cells, cell)
        os.makedirs(staged, exist_ok=True)
        for f in glob.glob(os.path.join(data, cell, "*.parquet")):
            if f not in matched:
                os.link(f, os.path.join(staged, os.path.basename(f)))
                n_linked += 1
        for f in glob.glob(os.path.join(staging_rewrite, cell, "*.parquet")):
            os.link(f, os.path.join(staged, os.path.basename(f)))

    # swap phase: park the original, promote the staged replacement
    old_root = os.path.join(path, "takedown-old")
    os.makedirs(old_root, exist_ok=True)
    for cell in touched:
        live = os.path.join(data, cell)
        os.rename(live, os.path.join(old_root, cell))
        os.rename(os.path.join(staging_cells, cell), live)
    for d in (old_root, staging_cells, staging_rewrite):
        shutil.rmtree(d, ignore_errors=True)
    # a cell whose every row was a victim stays as an empty directory —
    # harmless to readers, but tidy it away
    for cell in touched:
        live = os.path.join(data, cell)
        if os.path.isdir(live) and not os.listdir(live):
            os.rmdir(live)
    return {
        "docs_removed": n_docs,
        "files_rewritten": len(matched),
        "files_relinked": n_linked,
        "cells_touched": len(touched),
    }


def purge_ivf_snapshots(
    spark: SparkSession,
    path: str,
    doc_ids: list,
    id_col: str = "vec_id",
) -> dict:
    """Right-to-erasure for the index's snapshot HISTORY: rewrite every
    snapshot data file that contains a victim row (snapshots hardlink the
    live files, so remove_from_ivf_index leaves their inodes intact by
    design — immutability is the snapshot contract, but a GDPR erasure
    must reach history too). Per snapshot, with the MANIFEST as the sole
    source of truth: (1) GC any on-disk file the manifest does not
    reference — the only way such an orphan exists is a prior crashed
    purge, and it is either an already-replaced victim file (unlinking
    completes the erasure) or a replacement that never made the manifest
    (unlinking lets the replay rebuild it); (2) footer-stat-pruned victim
    scan over the MANIFEST's files only; (3) filtered rewrite of each
    matched file to a new name beside the old; (4) atomically swap in a
    manifest referencing the replacements; (5) unlink the victim-bearing
    originals LAST. A crash at any point replays convergently — the
    manifest only ever references complete files, so survivors are never
    duplicated and no victim survives a completed replay. Snapshots
    sharing an inode with the live index (or each other) each get their
    own replacement copy — erasure trades away the hardlink dedup for
    those files. Returns
    {"snapshots_touched", "files_rewritten", "orphans_gced"}."""
    import glob
    import shutil
    import uuid as _uuid

    doc_ids = [d for d in doc_ids if d is not None]
    snaps = sorted(glob.glob(os.path.join(path, "snapshots", "v*")))
    if not doc_ids or not snaps:
        return {"snapshots_touched": 0, "files_rewritten": 0, "orphans_gced": 0}
    n_touched = n_rewritten = n_gced = 0
    for snapdir in snaps:
        sdata = os.path.join(snapdir, "data")
        if not os.path.isdir(sdata):
            continue
        with open(os.path.join(snapdir, "manifest.json")) as f:
            manifest = json.load(f)
        listed = set(manifest["files"])
        for f_abs in glob.glob(os.path.join(sdata, "**", "*.parquet"), recursive=True):
            if os.path.relpath(f_abs, sdata) not in listed:
                os.remove(f_abs)
                n_gced += 1
        shutil.rmtree(os.path.join(snapdir, "__purge-tmp"), ignore_errors=True)
        if not listed:
            continue
        uris = ["file://" + os.path.join(sdata, rel) for rel in sorted(listed)]
        hits = (
            spark.read.option("basePath", sdata)
            .parquet(*uris)
            .filter(F.col(id_col).isin(doc_ids))
            .select(F.col("_metadata.file_path").alias("__f"))
            .distinct()
            .collect()
        )
        matched_uris = sorted(r["__f"] for r in hits)
        if not matched_uris:
            continue
        n_touched += 1
        # ONE job rewrites every matched file of this snapshot (not one
        # job per file — an erasure batch touching 1,000 files must not
        # pay 1,000 Spark job latencies): survivors of all matched files
        # are read together, keyed by a hash of their SOURCE file, and a
        # repartition on that key + partitionBy write emits one
        # replacement file per source file under __src=<hash>/ in the
        # tmp dir; the driver maps hash -> original rel path and moves
        # each replacement in beside its original.
        import hashlib as _hashlib

        rel_by_hash = {}
        for uri in matched_uris:
            local = _uri_to_local(uri)
            rel = os.path.relpath(local, sdata)
            # keyed by the NORMALIZED ABSOLUTE path — the same value the
            # SQL-side regexp_replace produces from _metadata.file_path
            rel_by_hash[_hashlib.md5(local.encode()).hexdigest()] = rel
        tmp = os.path.join(snapdir, "__purge-tmp")
        (
            spark.read.option("basePath", sdata)
            .parquet(*matched_uris)
            .withColumn("__src", F.md5(F.regexp_replace(
                F.col("_metadata.file_path"), "^file:/+", "/")))
            .filter(~F.col(id_col).isin(doc_ids))
            .drop("ivf_cell")
            .repartition(len(matched_uris), "__src")
            .write.mode("overwrite")
            .partitionBy("__src")
            .parquet(tmp)
        )
        renames = {}
        for h, rel in rel_by_hash.items():
            part = glob.glob(os.path.join(tmp, f"__src={h}", "*.parquet"))
            new_rel = None
            if part:  # some survivors: move the replacement in beside the old
                new_name = f"purged-{_uuid.uuid4().hex}.parquet"
                new_rel = os.path.join(os.path.dirname(rel), new_name)
                os.rename(part[0], os.path.join(sdata, new_rel))
            renames[rel] = new_rel
            n_rewritten += 1
        shutil.rmtree(tmp, ignore_errors=True)
        # manifest swap first (it only ever references complete files),
        # victim-bearing originals unlinked last
        manifest["files"] = sorted(
            [f for f in manifest["files"] if f not in renames]
            + [v for v in renames.values() if v is not None]
        )
        mtmp = os.path.join(snapdir, "manifest.json.tmp")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, os.path.join(snapdir, "manifest.json"))
        for rel in renames:
            old = os.path.join(sdata, rel)
            if os.path.exists(old):
                os.remove(old)
    return {
        "snapshots_touched": n_touched,
        "files_rewritten": n_rewritten,
        "orphans_gced": n_gced,
    }


def snapshot_ivf_index(path: str, tag: str | None = None) -> dict:
    """Create an immutable, zero-copy snapshot of the index: every data
    file and the centroids sidecar are HARDLINKED into
    <path>/snapshots/v<NNNN>/ with a manifest. Later appends, compactions,
    or rebuilds unlink/replace the live files but cannot touch the
    snapshot's inodes — Delta-style time travel for the index lifecycle
    (snapshot before a risky rebuild, roll back if recall regresses)
    without any table format on the classpath.

    On an object store the same contract is "manifest of immutable
    objects" (objects are never rewritten in place, so the manifest alone
    IS the snapshot); the hardlink is the local-FS equivalent. Returns the
    manifest dict ({version, tag, files, cells}).
    """
    import glob
    import shutil

    data = os.path.join(path, "data")
    snaps = os.path.join(path, "snapshots")
    os.makedirs(snaps, exist_ok=True)
    existing = sorted(glob.glob(os.path.join(snaps, "v*")))
    version = 1 + (int(os.path.basename(existing[-1])[1:]) if existing else 0)
    snapdir = os.path.join(snaps, f"v{version:04d}")
    files = []
    for src in glob.glob(os.path.join(data, "**", "*.parquet"), recursive=True):
        rel = os.path.relpath(src, data)
        dst = os.path.join(snapdir, "data", rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.link(src, dst)
        files.append(rel)
    # every root-level JSON sidecar snapshots with the data: centroids.json
    # for the raw-vector index, model.json for the IVF-PQ codes table —
    # an index restored without its quantizer model is unreadable
    for sc in glob.glob(os.path.join(path, "*.json")):
        os.link(sc, os.path.join(snapdir, os.path.basename(sc)))
    manifest = {
        "version": version,
        "tag": tag,
        "files": sorted(files),
        "cells": len(glob.glob(os.path.join(data, "ivf_cell=*"))),
    }
    with open(os.path.join(snapdir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def list_ivf_snapshots(path: str) -> list[dict]:
    """Manifests of every snapshot, oldest first."""
    import glob

    out = []
    for d in sorted(glob.glob(os.path.join(path, "snapshots", "v*"))):
        with open(os.path.join(d, "manifest.json")) as f:
            out.append(json.load(f))
    return out


def rollback_ivf_index(path: str, version: int) -> dict:
    """Restore the live index to snapshot `version`: hardlink the
    snapshot's files into a staging dir, then swap it in with two renames
    (same crash-safe pattern as compact_ivf_index — readers never see a
    half-restored index). The snapshot itself is untouched and can be
    rolled back to again. Returns the restored manifest."""
    import glob
    import shutil

    snapdir = os.path.join(path, "snapshots", f"v{version:04d}")
    with open(os.path.join(snapdir, "manifest.json")) as f:
        manifest = json.load(f)
    data = os.path.join(path, "data")
    staging = data + "__restoring"
    shutil.rmtree(staging, ignore_errors=True)
    for rel in manifest["files"]:
        src = os.path.join(snapdir, "data", rel)
        dst = os.path.join(staging, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.link(src, dst)
    old = data + "__old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(data, old)
    os.rename(staging, data)
    shutil.rmtree(old, ignore_errors=True)
    # restore every snapshotted root-level sidecar (centroids.json /
    # model.json), replacing the live copy
    for sc in glob.glob(os.path.join(snapdir, "*.json")):
        base = os.path.basename(sc)
        if base == "manifest.json":
            continue
        live = os.path.join(path, base)
        if os.path.exists(live):
            os.remove(live)
        os.link(sc, live)
    return manifest
