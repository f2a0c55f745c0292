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
    with open(os.path.join(path, "centroids.json"), "w") as f:
        json.dump(cents.tolist(), f)
    return cents


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
    cent_src = os.path.join(path, "centroids.json")
    if os.path.exists(cent_src):
        os.link(cent_src, os.path.join(snapdir, "centroids.json"))
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
    cent_snap = os.path.join(snapdir, "centroids.json")
    if os.path.exists(cent_snap):
        cent_live = os.path.join(path, "centroids.json")
        if os.path.exists(cent_live):
            os.remove(cent_live)
        os.link(cent_snap, cent_live)
    return manifest
