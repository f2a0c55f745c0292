"""Config env-overlay semantics (S12) + deterministic embedder (S8-S11)."""

from __future__ import annotations

import numpy as np
import pytest

from penr_oz_agent_memory_rust_spark.config import EngineConfig, ProviderConfig
from penr_oz_agent_memory_rust_spark.errors import NotConfiguredError
from penr_oz_agent_memory_rust_spark.sources.embedding_providers import (
    ProviderRegistry,
    hash_embed,
)


def test_env_url_alone_enables_vector_store():
    # reference src/config.rs:110-125: QDRANT_URL alone can enable the store
    cfg = EngineConfig.load(path=None, env={"QDRANT_URL": "/tmp/points"})
    assert cfg.vector_store is not None and cfg.vector_store.table_path == "/tmp/points"


def test_env_collection_only_overrides_existing():
    # QDRANT_COLLECTION without a configured store must NOT enable one
    cfg = EngineConfig.load(path=None, env={"QDRANT_COLLECTION": "x"})
    assert cfg.vector_store is None
    cfg2 = EngineConfig.load(path=None, env={"QDRANT_URL": "/tmp/p", "QDRANT_COLLECTION": "x"})
    assert cfg2.vector_store.collection == "x"


def test_database_url_enables_sessions():
    cfg = EngineConfig.load(path=None, env={"DATABASE_URL": "/tmp/sessions"})
    assert cfg.sessions_path == "/tmp/sessions"


def test_default_provider_must_exist():
    with pytest.raises(ValueError):
        EngineConfig(
            default_provider="nope",
            providers={"hash": ProviderConfig(name="hash", kind="hash")},
        ) and ProviderRegistry(
            EngineConfig(
                default_provider="nope",
                providers={"hash": ProviderConfig(name="hash", kind="hash")},
            )
        )


def test_registry_unknown_override_raises():
    cfg = EngineConfig.load(path=None, env={})
    reg = ProviderRegistry(cfg)
    with pytest.raises(NotConfiguredError):
        reg.get("missing-provider")


def test_retry_policy_recovers_from_transient():
    # reference src/vector_store.rs:108-145: retry w/ backoff on transient
    from unittest.mock import patch

    from penr_oz_agent_memory_rust_spark.errors import UpstreamError
    from penr_oz_agent_memory_rust_spark.sources.embedding_providers import _with_retry

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise UpstreamError("transient 503")
        return [1.0]

    with patch("time.sleep") as slept:
        assert _with_retry(flaky) == [1.0]
    assert calls["n"] == 3
    # exponential backoff 1, 2 (then success)
    assert [c.args[0] for c in slept.call_args_list] == [1.0, 2.0]

    calls["n"] = -100  # always failing
    with patch("time.sleep"), pytest.raises(UpstreamError):
        _with_retry(lambda: (_ for _ in ()).throw(UpstreamError("down")), attempts=2)


def test_paginate_limit_zero_is_unbounded(spark):
    # reference src/session_store.rs:146-151: limit 0 => bind -1 (no limit)
    from pyspark.sql import functions as F

    from penr_oz_agent_memory_rust_spark.operators.topk import paginate

    df = spark.range(10).withColumnRenamed("id", "i")
    out = paginate(df, [F.col("i").desc()], limit=0, clamp=None)
    assert out.count() == 10


def test_hash_embed_deterministic_and_normalized():
    a = hash_embed("hello world", 32)
    b = hash_embed("hello world", 32)
    c = hash_embed("different text", 32)
    assert a == b != c
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-5
    assert hash_embed("", 8) == [0.0] * 8


def test_similar_texts_have_higher_cosine():
    a = np.array(hash_embed("the quick brown fox", 64))
    b = np.array(hash_embed("the quick brown dog", 64))
    c = np.array(hash_embed("completely unrelated words here", 64))
    assert float(a @ b) > float(a @ c)
