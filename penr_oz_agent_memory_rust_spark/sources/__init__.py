__all__ = ["tables", "embedding_providers"]
