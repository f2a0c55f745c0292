"""Explicit StructTypes for every engine table (SURVEY §1.3, FIXTURES.md).

The reference's data model (reference src/memory.rs:11-21, src/vector_store.rs:44-56,
src/session_store.rs:24-34) is row-oriented structs; here each becomes a declared
DataFrame schema. ``FloatType`` (not double) is kept for embeddings/scores to match
the reference's f32 math (reference src/embedding/mod.rs:15).
"""

from __future__ import annotations

from pyspark.sql import types as T

# MemoryEntry (reference src/memory.rs:11-21): in-memory store row.
MEMORIES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),  # UUID v4 (src/memory.rs:79)
        T.StructField("text", T.StringType(), False),  # non-empty (src/routes.rs:175-183)
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("session", T.StringType(), True),  # nullable tag (src/memory.rs:18)
        T.StructField("embedding", T.ArrayType(T.FloatType(), containsNull=False), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# Qdrant point (reference src/vector_store.rs:232-240): metadata values are
# arbitrary JSON in the reference; encoded here as JSON-serialized strings
# (documented deviation, SURVEY §7 "Dynamic JSON metadata").
MEMORY_POINTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("vector", T.ArrayType(T.FloatType(), containsNull=False), True),
        T.StructField("text", T.StringType(), False),  # reserved payload key "text"
        T.StructField("session_id", T.StringType(), True),  # reserved key (src/routes.rs:271-274)
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("updated_at", T.TimestampType(), True),  # MERGE recency key
    ]
)

# Session (reference src/session_store.rs:24-34; migrations/001_create_sessions.sql:4-9).
SESSIONS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
    ]
)

# Search result projections (reference src/memory.rs:24-32, src/vector_store.rs:44-56).
SEARCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("session", T.StringType(), True),
        T.StructField("score", T.FloatType(), True),
    ]
)

# Multimodal document row: opaque binary payload + typed metadata
# (north-star extension, not in the reference).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
