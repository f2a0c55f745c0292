"""External ANN-index sink: the batch index-building job (SURVEY §4, HNSW
row — "batch index *building* for an external ANN store is the Spark-shaped
part").

`write_ann_index` materializes a corpus as **upsert-ready point batches**
in a loadable layout:

    <path>/manifest.json          index metadata (dim, metric, cells, counts)
    <path>/centroids.json         IVF centroid matrix (k x d floats)
    <path>/points/ivf_cell=N/...  parquet: (point_id, vector, payload)

The point schema mirrors the reference store's upsert body
(reference src/vector_store.rs:232-240): string id, float vector, and a
payload map carrying the metadata plus the document text under the
reserved "text" key — attempting to pass "text" as metadata is rejected
exactly like the reference's RESERVED_TEXT_KEY_ERROR
(src/vector_store.rs:225-229).

Partitioning by IVF cell serves both consumers:
  * an external ANN store ingests cell-by-cell (bounded batches, stable
    retry unit, `iter_upsert_batches` yields the JSON bodies), and
  * Spark itself can serve probe-limited search straight off the layout
    (`search_ann_index`) with partition pruning at the scan — so the
    "index" is usable before/without any external store.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from penr_oz_agent_memory_rust_spark.errors import ValidationError
from penr_oz_agent_memory_rust_spark.functions import similarity
from penr_oz_agent_memory_rust_spark.operators import knn
from penr_oz_agent_memory_rust_spark.operators.topk import top_k

RESERVED_TEXT_KEY = "text"


def write_ann_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    payload_cols: list[str] | None = None,
    text_col: str | None = None,
    n_centroids: int = 16,
    n_iters: int = 5,
    seed: int = 42,
) -> dict:
    """Build and write the index; returns the manifest dict.

    Scale notes: centroid training collects only a capped sample
    (knn.train_ivf_centroids); assignment is a pure column expression; the
    write is one exchange-free pass partitioned by cell. Per-cell row
    counts in the manifest come from a single column-pruned aggregate.
    """
    payload_cols = payload_cols or []
    if RESERVED_TEXT_KEY in payload_cols:
        # reference src/vector_store.rs:225-229 — "text" is reserved for
        # the document body; metadata may not shadow it
        raise ValidationError(
            f"metadata key '{RESERVED_TEXT_KEY}' is reserved for the document text"
        )
    cents = knn.train_ivf_centroids(
        df, vec_col=vec_col, n_centroids=n_centroids, n_iters=n_iters, seed=seed
    )
    payload_entries: list = []
    for c in payload_cols:
        payload_entries += [F.lit(c), F.col(c).cast("string")]
    if text_col is not None:
        payload_entries += [F.lit(RESERVED_TEXT_KEY), F.col(text_col).cast("string")]
    payload = (
        F.map_from_arrays(
            F.array(*payload_entries[0::2]), F.array(*payload_entries[1::2])
        )
        if payload_entries
        else F.lit(None).cast("map<string,string>")
    )
    points = df.select(
        F.col(id_col).cast("string").alias("point_id"),
        F.col(vec_col).cast("array<float>").alias("vector"),
        payload.alias("payload"),
        knn.ivf_assign_expr(F.col(vec_col), cents).alias("ivf_cell"),
    )
    points.write.mode("overwrite").partitionBy("ivf_cell").parquet(
        os.path.join(path, "points")
    )
    # manifest: everything a loader (or an external store's ingest job)
    # needs without listing files
    cell_counts = {
        int(r["ivf_cell"]): r["n"]
        for r in spark_read_points(df.sparkSession, path)
        .groupBy("ivf_cell")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    manifest = {
        "format_version": 1,
        "metric": "cosine",
        "dim": int(cents.shape[1]),
        "n_centroids": int(cents.shape[0]),
        "n_points": int(sum(cell_counts.values())),
        "cells": {str(k): int(v) for k, v in sorted(cell_counts.items())},
        "point_schema": "point_id string, vector array<float>, payload map<string,string>",
    }
    with open(os.path.join(path, "centroids.json"), "w") as f:
        json.dump(cents.tolist(), f)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, "manifest.json")) as f:
        return json.load(f)


def spark_read_points(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "points"))


def search_ann_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probes: int = 2,
    score_threshold: float | None = None,
) -> DataFrame:
    """Probe-limited search over the written index, mirroring the reference
    search contract (limit + optional score_threshold, payload returned —
    src/vector_store.rs:260-310). The cell filter is a partition-column
    literal, so non-probed cells are pruned before any file is opened.
    Output: (point_id, score, payload), score DESC / point_id ASC.
    """
    import numpy as np

    with open(os.path.join(path, "centroids.json")) as f:
        cents = np.asarray(json.load(f), dtype=np.float32)
    q = np.asarray(query_vec, dtype=np.float32)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    order = np.argsort(-(cents @ q))
    probes = [int(c) for c in order[: min(n_probes, len(order))]]
    pts = spark_read_points(spark, path).filter(F.col("ivf_cell").isin(probes))
    scored = pts.withColumn(
        "score",
        similarity.cosine_f32(
            F.col("vector"), similarity.query_vec_lit([float(x) for x in query_vec])
        ),
    ).filter(F.col("score").isNotNull())
    if score_threshold is not None:
        scored = scored.filter(F.col("score") >= float(score_threshold))
    return top_k(scored, "score", k, tiebreak="point_id").select(
        "point_id", "score", "payload"
    )


def iter_upsert_batches(spark: SparkSession, path: str, batch_size: int = 256):
    """Yield upsert bodies in the reference store's wire shape
    (src/vector_store.rs:232-240): {"points": [{"id", "vector",
    "payload"}, ...]}, cell by cell. Driver memory is bounded by one batch
    (toLocalIterator streams partitions); an ingest job POSTs each body to
    the external store and can retry per cell."""
    manifest = read_manifest(path)
    for cell in sorted(int(c) for c in manifest["cells"]):
        pts = (
            spark_read_points(spark, path)
            .filter(F.col("ivf_cell") == cell)
            .select("point_id", "vector", "payload")
        )
        batch: list[dict] = []
        for row in pts.toLocalIterator():
            batch.append(
                {
                    "id": row["point_id"],
                    "vector": [float(x) for x in row["vector"]],
                    "payload": dict(row["payload"] or {}),
                }
            )
            if len(batch) >= batch_size:
                yield {"points": batch, "cell": cell}
                batch = []
        if batch:
            yield {"points": batch, "cell": cell}
