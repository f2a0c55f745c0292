__all__ = [
    "memory_store",
    "vector_store",
    "session_store",
    "topk",
    "knn",
    "dedup",
    "text_ops",
    "multimodal",
]
