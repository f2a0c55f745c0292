__all__ = ["tables", "embedding_providers", "ann_sink", "ann_push", "delta_tables", "bucketed", "python_datasource"]
