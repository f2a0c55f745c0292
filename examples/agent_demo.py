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

    spark.stop()


if __name__ == "__main__":
    main()
