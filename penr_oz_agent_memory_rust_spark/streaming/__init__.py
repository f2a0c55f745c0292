__all__ = ["ingest"]
