"""Embedding provider sources (SURVEY §2.1 S8-S11).

The reference exposes a fixed plugin trait `async fn embed(&str) -> Vec<f32>`
(reference src/embedding/mod.rs:22-25) with three HTTP implementations
(ollama.rs:45-72, openai.rs:77-116, claude.rs:58-100) and a registry that
validates the default and resolves per-request overrides
(src/embedding/mod.rs:31-89).

Spark-first shape: embedding is a *batch stage* — an Arrow-batched pandas UDF
over the text column, one provider per configured name. The default provider
is a seeded hash-projection embedder (deterministic, offline, no HTTP) so
every test and oracle comparison is reproducible; HTTP providers are gated
behind import-try and wrapped in the reference's retry policy (5 attempts,
1/2/4/8 s backoff on 429/503/network — src/vector_store.rs:108-145).

Scale notes: per-partition batching bounds provider concurrency to the number
of executor slots; Arrow transfer amortizes serde. Never per-row HTTP.
"""

from __future__ import annotations

import functools
import hashlib
import time
from collections.abc import Callable, Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F, types as T

from penr_oz_agent_memory_rust_spark.config import EngineConfig, ProviderConfig
from penr_oz_agent_memory_rust_spark.errors import NotConfiguredError, UpstreamError

DEFAULT_DIM = 64  # matches /root/testdata embeddings; reference default is 768


@functools.lru_cache(maxsize=65536)
def _token_vec(token: str, dim: int) -> np.ndarray:
    """Deterministic pseudo-random unit-ish vector for one token.

    md5(token) seeds a PCG64 generator — stable across processes/machines
    (no PYTHONHASHSEED dependence), so embeddings are reproducible offline.
    Memoized per process: generator construction dominates embedding cost,
    and token frequency is Zipf-distributed in any corpus, so the cache
    turns the per-token cost into a per-VOCABULARY cost (~5x faster on the
    testdata corpus). Callers never mutate the returned array.
    """
    seed = int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal(dim).astype(np.float32)


def hash_embed(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Seeded hash-projection embedding: mean of token vectors, L2-normalized.

    Plays the role of the reference's provider call (S8-S10) in all offline
    paths. Similar token multisets => high cosine, which is enough structure
    for ranked-search tests.
    """
    tokens = text.lower().split()
    if not tokens:
        return [0.0] * dim
    acc = np.zeros(dim, dtype=np.float32)
    for tok in tokens:
        acc += _token_vec(tok, dim)
    n = float(np.linalg.norm(acc))
    if n > 0:
        acc = acc / np.float32(n)
    return [float(x) for x in acc.astype(np.float32)]


def hash_embed_udf(dim: int = DEFAULT_DIM):
    """Arrow-batched pandas UDF form of `hash_embed` for DataFrame pipelines."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: hash_embed(t if t is not None else "", dim))

    return _embed


def _with_retry(fn: Callable[[], list[float]], attempts: int = 5) -> list[float]:
    """Reference retry policy: 5 attempts, exponential backoff 1/2/4/8 s on
    transient failures (reference src/vector_store.rs:108-145)."""
    delay = 1.0
    for i in range(attempts):
        try:
            return fn()
        except UpstreamError:
            if i == attempts - 1:
                raise
            time.sleep(delay)
            delay *= 2
    raise UpstreamError("unreachable")


def _http_embed_factory(p: ProviderConfig) -> Callable[[str], list[float]]:
    """Live HTTP providers (S8 Ollama / S9 OpenAI-compatible / S10 Voyage).

    Requires `requests` and a reachable service — neither exists in the
    offline harness, so calls raise NotConfiguredError unless the import and
    config both succeed. Request/response shapes follow the reference:
      ollama: POST {model, input} -> {"embeddings": [[..]]}            (ollama.rs:45-72)
      openai: POST {model, input} -> {"data": [{"embedding": [..]}]}   (openai.rs:77-116)
      claude: POST [text] w/ x-api-key + anthropic-version header      (claude.rs:58-100)
    """
    try:
        import requests  # noqa: F401
    except ImportError:
        def _unavailable(_text: str) -> list[float]:
            raise NotConfiguredError(f"HTTP provider {p.name!r} requires `requests`")

        return _unavailable

    import requests

    base = p.url.rstrip("/")  # trailing-slash trim (reference ollama.rs:26 etc.)

    def _call(text: str) -> list[float]:
        if p.kind == "ollama":
            r = requests.post(f"{base}/api/embed", json={"model": p.model, "input": text}, timeout=30)
            _raise_transient(r)
            embs = r.json().get("embeddings") or []
            if not embs:
                raise UpstreamError("ollama returned no embeddings")
            return embs[0]
        if p.kind == "openai":
            headers = (
                {"Authorization": f"Bearer {p.api_key}"}
                if p.auth_scheme == "bearer"
                else {"api-key": p.api_key}
            )
            r = requests.post(
                f"{base}{p.path}", json={"model": p.model, "input": text}, headers=headers, timeout=30
            )
            _raise_transient(r)
            data = r.json().get("data") or []
            if not data:
                raise UpstreamError("openai returned empty data")
            return data[0]["embedding"]
        if p.kind == "claude":
            if not p.api_key:
                raise NotConfiguredError("claude provider requires an api key")  # claude.rs:40-44
            r = requests.post(
                f"{base}/v1/embeddings",
                json={"model": p.model, "input": [text]},
                headers={"x-api-key": p.api_key, "anthropic-version": "2023-06-01"},
                timeout=30,
            )
            _raise_transient(r)
            data = r.json().get("data") or []
            if not data:
                raise UpstreamError("voyage returned empty data")
            return data[0]["embedding"]
        raise NotConfiguredError(f"unknown provider kind {p.kind!r}")

    def _raise_transient(r) -> None:
        if r.status_code in (429, 503):
            raise UpstreamError(f"transient {r.status_code}")
        if r.status_code >= 400:
            raise NotConfiguredError(f"provider error {r.status_code}: {r.text[:200]}")

    return lambda text: _with_retry(lambda: _call(text))


class ProviderRegistry:
    """Build all configured providers; validate default; resolve overrides
    (reference src/embedding/mod.rs:31-89)."""

    def __init__(self, config: EngineConfig):
        self._fns: dict[str, Callable[[str], list[float]]] = {}
        self._dims: dict[str, int] = {}
        for name, p in config.providers.items():
            if p.kind == "hash":
                dim = p.dimensions or DEFAULT_DIM
                self._fns[name] = lambda t, d=dim: hash_embed(t, d)
            else:
                self._fns[name] = _http_embed_factory(p)
            self._dims[name] = p.dimensions
        self.default_name = config.default_provider
        if self.default_name not in self._fns:
            raise ValueError(f"default provider {self.default_name!r} not configured")

    def provider_names(self) -> list[str]:
        """Sorted ascending, as /health reports (reference src/routes.rs:76)."""
        return sorted(self._fns)

    def get(self, override: str | None = None) -> Callable[[str], list[float]]:
        name = override or self.default_name
        if name not in self._fns:
            raise NotConfiguredError(f"unknown provider {name!r}")  # mod.rs:73-79
        return self._fns[name]

    def dimensions(self, override: str | None = None) -> int:
        return self._dims[override or self.default_name]

    def embed_column(self, override: str | None = None) -> Callable[[Column], Column]:
        """Column-level batch embed: the engine's S8-S11 as a pandas-UDF stage."""
        fn = self.get(override)

        @F.pandas_udf(T.ArrayType(T.FloatType()))
        def _embed(texts: pd.Series) -> pd.Series:
            return texts.map(lambda t: fn(t if t is not None else ""))

        return _embed


def embed_texts(texts: Iterable[str], dim: int = DEFAULT_DIM) -> list[list[float]]:
    return [hash_embed(t, dim) for t in texts]
