"""End-to-end agent-memory demo — the engine equivalent of the reference's
example client (reference examples/agent_client.rs:2-9): health -> create a
session -> store memories -> semantic searches -> agent recall+store ->
delete -> cleanup. Run: python examples/agent_demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from penr_oz_agent_memory_rust_spark.config import (
    EngineConfig,
    ProviderConfig,
    VectorStoreConfig,
)
from penr_oz_agent_memory_rust_spark.engine import MemoryEngine
from penr_oz_agent_memory_rust_spark.session import get_spark

# the reference demo corpus (examples/agent_client.rs:121-142)
MEMORIES = [
    ("User prefers Rust over Python for systems programming", {"topic": "preferences"}),
    ("User is building a web scraper project", {"topic": "projects"}),
    ("User asked about async/await patterns yesterday", {"topic": "history"}),
    ("User's favorite database is PostgreSQL", {"topic": "preferences"}),
    ("User wants to learn more about WebAssembly", {"topic": "goals"}),
]

QUERIES = [
    "what programming languages does the user like",
    "what is the user working on",
    "what does the user want to learn",
]


def main() -> None:
    workdir = tempfile.mkdtemp(prefix="agent_demo_")
    spark = get_spark(app_name="agent-demo", cpus="4")
    cfg = EngineConfig(
        default_provider="hash",
        providers={"hash": ProviderConfig(name="hash", kind="hash", dimensions=64)},
        vector_store=VectorStoreConfig(table_path=f"{workdir}/points", dimensions=64),
        sessions_path=f"{workdir}/sessions",
        table_backend="versioned",  # manifest commits: time travel below
    )
    engine = MemoryEngine(spark, cfg, memories_path=f"{workdir}/memories")

    print("health:", engine.health())

    session = engine.create_session(tags=["demo-agent-session"])
    print("session:", session["id"])

    ids = [engine.store_memory(text, metadata=meta, session=session["id"]) for text, meta in MEMORIES]
    print(f"stored {len(ids)} memories")

    for q in QUERIES:
        hits = engine.search_memory(q, limit=2, session=session["id"]).collect()
        print(f"\nquery: {q}")
        for h in hits:
            print(f"  {h['score']:.3f}  {h['text']}")

    v_before = engine.memories.current_version()
    deleted = engine.delete_memory(ids[0])
    print(f"\ndeleted first memory: {deleted}; remaining:",
          engine.search_memory("anything", limit=100, session=session["id"]).count())

    # the versioned backend keeps every commit: query the pre-delete
    # snapshot and show the audit trail
    print("pre-delete snapshot rows:", engine.memories.read(version=v_before).count())
    print("memories table history:",
          [(h["version"], h["op"]) for h in engine.memories.history()])

    # --- change-data-feed consumer: keep a downstream token index fresh
    # INCREMENTALLY from engine.memories.changes(), never re-reading the
    # table — the CDC pattern a fleet of derived indexes runs at scale
    from pyspark.sql import functions as F

    from penr_oz_agent_memory_rust_spark.functions import hashing

    def token_counts(df, sign_col=None):
        sign = (
            F.when(F.col(sign_col) == "insert", F.lit(1)).otherwise(F.lit(-1))
            if sign_col
            else F.lit(1)
        )
        return (
            df.select(
                F.explode(hashing.word_tokens(F.col("text"))).alias("token"),
                sign.alias("sign"),
            )
            .filter(F.col("token") != "")
            .groupBy("token")
            .agg(F.sum("sign").alias("cnt"))
        )

    stale = token_counts(engine.memories.read(version=v_before))
    delta = token_counts(
        engine.memories.changes(v_before), sign_col="_change_type"
    ).withColumnRenamed("cnt", "delta")
    refreshed = (
        stale.join(delta, "token", "full_outer")
        .select(
            "token",
            (F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(F.col("delta"), F.lit(0))).alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    rebuilt = token_counts(engine.memories.read())
    diff = refreshed.join(rebuilt, ["token", "cnt"], "full_outer").filter(
        F.col("token").isNull() | F.col("cnt").isNull()
    )
    print("incremental index refresh == from-scratch rebuild:", diff.count() == 0)

    # OPTIMIZE is just another commit: layout improves, contents (and the
    # change feed) are untouched
    v_pre_opt = engine.memories.current_version()
    engine.memories.optimize()
    print("post-optimize feed rows (expect 0):",
          engine.memories.changes(v_pre_opt).count())
    print("final history:",
          [(h["version"], h["op"]) for h in engine.memories.history()])

    spark.stop()


if __name__ == "__main__":
    main()
