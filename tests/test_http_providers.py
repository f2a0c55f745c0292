"""HTTP embedding-provider behavior — ports the reference's wiremock suites
(reference src/embedding/ollama.rs:75-152, openai.rs:119-289,
claude.rs:103-188) against a stubbed `requests` module: response parsing,
auth schemes and headers, error taxonomy, retry on transient failures."""

from __future__ import annotations

import sys
import types

import pytest

from penr_oz_agent_memory_rust_spark.config import ProviderConfig
from penr_oz_agent_memory_rust_spark.errors import NotConfiguredError, UpstreamError


class FakeResponse:
    def __init__(self, status_code=200, payload=None, text=""):
        self.status_code = status_code
        self._payload = payload or {}
        self.text = text

    def json(self):
        return self._payload


@pytest.fixture()
def fake_requests(monkeypatch):
    """Install a stub `requests` capturing calls; yields the call log and a
    setter for the scripted responses."""
    calls = []
    responses = []

    mod = types.ModuleType("requests")

    def post(url, json=None, headers=None, timeout=None):
        calls.append({"url": url, "json": json, "headers": headers or {}})
        return responses.pop(0) if responses else FakeResponse()

    mod.post = post
    monkeypatch.setitem(sys.modules, "requests", mod)
    # no real sleeping during retry tests
    import time as _time

    monkeypatch.setattr(_time, "sleep", lambda _s: None)
    return calls, responses


def make(kind, **kw):
    from penr_oz_agent_memory_rust_spark.sources.embedding_providers import _http_embed_factory

    defaults = dict(name=kind, kind=kind, url="http://svc:1234/", model="m", api_key="k")
    defaults.update(kw)
    return _http_embed_factory(ProviderConfig(**defaults))


def test_ollama_first_embedding_extracted(fake_requests):
    # ollama.rs:45-72: {"embeddings": [[...]]} -> first vector
    calls, responses = fake_requests
    responses.append(FakeResponse(200, {"embeddings": [[1.0, 2.0], [9.9]]}))
    assert make("ollama")("hello") == [1.0, 2.0]
    assert calls[0]["url"] == "http://svc:1234/api/embed"  # trailing slash trimmed
    assert calls[0]["json"] == {"model": "m", "input": "hello"}


def test_ollama_empty_embeddings_is_error(fake_requests):
    # ollama.rs:139-152
    _, responses = fake_requests
    responses.append(FakeResponse(200, {"embeddings": []}))
    with pytest.raises(UpstreamError):
        make("ollama")("hello")


def test_openai_bearer_and_api_key_schemes(fake_requests):
    # openai.rs:119-289: bearer vs `api-key` header, custom path
    calls, responses = fake_requests
    responses.append(FakeResponse(200, {"data": [{"embedding": [0.5]}]}))
    assert make("openai", auth_scheme="bearer")("x") == [0.5]
    assert calls[0]["headers"] == {"Authorization": "Bearer k"}
    assert calls[0]["url"] == "http://svc:1234/v1/embeddings"

    responses.append(FakeResponse(200, {"data": [{"embedding": [0.7]}]}))
    assert make("openai", auth_scheme="api-key", path="/openai/deployments/d/embeddings")("x") == [0.7]
    assert calls[1]["headers"] == {"api-key": "k"}
    assert calls[1]["url"] == "http://svc:1234/openai/deployments/d/embeddings"


def test_openai_401_and_empty_data(fake_requests):
    _, responses = fake_requests
    responses.append(FakeResponse(401, text="unauthorized"))
    with pytest.raises(NotConfiguredError):
        make("openai")("x")
    responses.append(FakeResponse(200, {"data": []}))
    with pytest.raises(UpstreamError):
        make("openai")("x")


def test_claude_headers_and_missing_key(fake_requests):
    # claude.rs:103-188: x-api-key + anthropic-version; hard-fail on no key
    calls, responses = fake_requests
    responses.append(FakeResponse(200, {"data": [{"embedding": [0.1, 0.2]}]}))
    assert make("claude")("x") == [0.1, 0.2]
    assert calls[0]["headers"]["x-api-key"] == "k"
    assert calls[0]["headers"]["anthropic-version"] == "2023-06-01"
    assert calls[0]["json"]["input"] == ["x"]  # input is a LIST

    with pytest.raises(NotConfiguredError):
        make("claude", api_key="")("x")


def test_transient_503_retried_then_succeeds(fake_requests):
    # retry policy (vector_store.rs:108-145) applied to provider calls
    _, responses = fake_requests
    responses.append(FakeResponse(503))
    responses.append(FakeResponse(429))
    responses.append(FakeResponse(200, {"embeddings": [[3.0]]}))
    assert make("ollama")("x") == [3.0]


def test_unknown_kind_raises():
    with pytest.raises(NotConfiguredError):
        make("mystery")("x")
