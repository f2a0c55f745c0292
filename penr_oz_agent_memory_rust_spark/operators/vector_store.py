"""Qdrant-path parity as batch DataFrame ops (SURVEY §2.1-2.2: S4 upsert,
S5/P3 search with score threshold, P5 reserved-key validation, P7 payload
projection, P8 metadata enrichment).

Reference: points are {id, vector, payload{text, session_id?, ...json}}
(reference src/vector_store.rs:232-240); "text"/"session_id" are reserved
payload keys rejected on input (src/vector_store.rs:32-37,225-229;
src/routes.rs:231-240); search returns {id, score, text, metadata} with the
reserved "text" key extracted and stripped from metadata
(src/vector_store.rs:347-377); HNSW ANN is replaced by exact brute-force
scoring — embarrassingly parallel, recall 1.0 (SURVEY §4).

Scale notes: upsert-by-id is the classic last-writer-wins dedup — one shuffle
on id via a window; at real scale this is a MERGE INTO on a transactional
format behind the ParquetTable seam. Search is scan+score+TakeOrdered: no
shuffle at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from penr_oz_agent_memory_rust_spark.errors import ValidationError
from penr_oz_agent_memory_rust_spark.functions import similarity
from penr_oz_agent_memory_rust_spark.operators.topk import top_k

RESERVED_KEYS = ("text", "session_id")  # reference src/vector_store.rs:32-37


def validate_reserved_keys(rows: DataFrame, metadata_col: str = "metadata") -> tuple[DataFrame, DataFrame]:
    """P5: reject rows whose metadata carries a reserved key
    (reference src/routes.rs:231-240). Returns (valid, rejects)."""
    bad_cond = F.lit(False)
    for key in RESERVED_KEYS:
        bad_cond = bad_cond | F.map_contains_key(F.col(metadata_col), F.lit(key))
    meta_present = F.col(metadata_col).isNotNull()
    return rows.filter(~(meta_present & bad_cond)), rows.filter(meta_present & bad_cond)


def enrich_session_id(rows: DataFrame, metadata_col: str = "metadata", fk_col: str = "session_id") -> DataFrame:
    """P8: inject session_id into the payload map before upsert
    (reference src/routes.rs:271-274)."""
    enriched = F.map_concat(
        F.coalesce(F.col(metadata_col), F.expr("map()")),
        F.create_map(F.lit("session_id"), F.col(fk_col)),
    )
    return rows.withColumn(
        metadata_col, F.when(F.col(fk_col).isNotNull(), enriched).otherwise(F.col(metadata_col))
    )


def upsert(points: DataFrame, new_points: DataFrame) -> DataFrame:
    """S4: idempotent-by-id write (reference src/vector_store.rs:215-255).

    union + last-writer-wins by (id, updated_at DESC) — the plain-Parquet
    MERGE emulation from SURVEY §2.1. New points with NULL id get uuid().
    """
    prepared = new_points.withColumn("id", F.coalesce(F.col("id"), F.expr("uuid()")))
    if "updated_at" not in prepared.columns:
        prepared = prepared.withColumn("updated_at", F.current_timestamp())
    unioned = points.withColumn("__src", F.lit(0)).unionByName(
        prepared.withColumn("__src", F.lit(1)), allowMissingColumns=True
    )
    w = Window.partitionBy("id").orderBy(F.col("__src").desc(), F.col("updated_at").desc())
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def search(
    points: DataFrame,
    query_vec: list[float],
    limit: int = 5,
    score_threshold: float | None = None,
    metric: str = "cosine",
    precision: str = "f32",
) -> DataFrame:
    """S5 + P3 + P7: score -> threshold filter -> top-k -> hit projection.

    limit default 5 (reference src/routes.rs:167,334); threshold is
    `score >= t` pushed below the sort (src/vector_store.rs:283-285).
    Output = {id, score, text, metadata} with reserved keys stripped from
    metadata (P7, src/vector_store.rs:347-377).
    """
    if not query_vec:
        raise ValidationError("query embedding must be non-empty")
    q = similarity.query_vec_lit(query_vec, precision)
    scored = points.withColumn(
        "score", similarity.score_expr(metric, F.col("vector"), q, precision)
    ).filter(F.col("score").isNotNull())
    if score_threshold is not None:
        scored = scored.filter(F.col("score") >= float(score_threshold))
    hits = top_k(scored, "score", limit, tiebreak="id")
    return project_hit(hits)


def project_hit(hits: DataFrame) -> DataFrame:
    """P7: id coerced to string, payload "text" extracted, reserved keys
    removed from the remaining metadata (reference src/vector_store.rs:347-377)."""
    cleaned = F.map_filter(
        F.coalesce(F.col("metadata"), F.expr("map()")),
        lambda k, _v: ~k.isin(list(RESERVED_KEYS)),
    )
    return hits.select(
        F.col("id").cast("string").alias("id"),
        F.col("score"),
        F.col("text"),
        cleaned.alias("metadata"),
    )
