from penr_oz_agent_memory_rust_spark.plans import explain

__all__ = ["explain"]
