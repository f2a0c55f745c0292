"""penr_oz_agent_memory_rust_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of derinworks/penr-oz-agent-memory-rust.

The reference (/root/reference, Rust) is an agent-memory vector-store proxy:
embed text -> store {id, text, metadata, session, embedding} -> cosine-score ->
filter -> top-k. This package re-expresses every operator in its inventory
(SURVEY.md §2) as idiomatic Spark DataFrame plans, plus the large-scale
training-data-pipeline operators (dedup, ANN similarity search, text analysis,
multimodal plumbing) the reference's north star calls for.

Layout:
    schemas     — explicit StructTypes for every table (SURVEY §1.3)
    config      — TOML + env-overlay config (reference src/config.rs:92-139)
    functions/  — scalar kernels: similarity (K1/K2), portable hashing, text
    operators/  — memory_store, vector_store, session_store, topk, knn, dedup
    sources/    — table IO seam, embedding providers (S8-S11)
    streaming/  — Structured Streaming ingest (foreachBatch validation pipeline)
    plans/      — plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
