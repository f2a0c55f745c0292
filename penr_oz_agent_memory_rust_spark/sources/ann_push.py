"""Push a written ANN index to an external vector store over HTTP.

The batch-side counterpart of the reference's Qdrant REST client
(reference src/vector_store.rs:1-14 endpoint map):

    GET  /collections/{name}            does the collection exist
    PUT  /collections/{name}            create it ({vectors:{size,distance}})
    PUT  /collections/{name}/points     upsert a batch of points

`AnnStoreClient` reproduces the reference's client behavior with stdlib
urllib only:

  * optional `api-key` header, sent only when non-empty
    (src/vector_store.rs:91-100),
  * ensure-collection semantics: 200 = exists; 404 → create, where a
    400/409 on the create means a concurrent creator won the race and is
    success (src/vector_store.rs:160-199),
  * retry policy: up to 5 total attempts with exponential backoff
    1 s, 2 s, 4 s, 8 s on transient failures — network errors, HTTP 429
    and HTTP 503 (src/vector_store.rs:207-145 ensure_collection loop);
    the same policy guards each upsert batch so one flaky response does
    not abort a multi-hour index push,
  * non-transient HTTP failures raise `UpstreamError` carrying the
    status, mirroring VectorStoreError::Api (src/error.rs).

`push_ann_index` streams `ann_sink.iter_upsert_batches` — driver memory
stays bounded by one batch; each batch is one PUT in the reference's
exact wire shape ({"points": [{"id","vector","payload"}]},
src/vector_store.rs:232-240) and one retry unit. At 100 TB the push is
network-bound either way; what matters is that nothing ever materializes
more than `batch_size` points on the driver and a failed cell can be
re-pushed idempotently (upserts by stable point id).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from typing import Callable, Iterable

from penr_oz_agent_memory_rust_spark.errors import UpstreamError

TRANSIENT_STATUSES = (429, 503)
MAX_ATTEMPTS = 5


class AnnStoreClient:
    """Minimal REST client for a Qdrant-shaped vector store."""

    def __init__(
        self,
        base_url: str,
        collection: str,
        api_key: str | None = None,
        timeout: float = 30.0,
        sleep: Callable[[float], None] = time.sleep,
        opener: urllib.request.OpenerDirector | None = None,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.collection = collection
        self.api_key = api_key
        self.timeout = timeout
        self._sleep = sleep
        self._opener = opener or urllib.request.build_opener()

    @classmethod
    def from_config(cls, vs_cfg) -> "AnnStoreClient":
        """Build from a config.VectorStoreConfig whose table_path is an
        http(s) URL (the [qdrant] TOML section / QDRANT_* env overlays,
        reference src/config.rs:45-69)."""
        if not str(vs_cfg.table_path).startswith(("http://", "https://")):
            raise ValueError(
                "vector_store.table_path is not an http(s) URL; the push "
                f"client needs an external store address, got {vs_cfg.table_path!r}"
            )
        return cls(
            vs_cfg.table_path, vs_cfg.collection, api_key=vs_cfg.api_key or None
        )

    # -- transport ---------------------------------------------------------

    def _request(self, method: str, path: str, body: dict | None = None):
        """One HTTP round trip → (status, parsed-json-or-None).

        Network-level failures raise URLError; HTTP error statuses are
        RETURNED (not raised) so callers can apply the reference's
        status-specific handling."""
        url = f"{self.base_url}{path}"
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        if data is not None:
            req.add_header("Content-Type", "application/json")
        if self.api_key:  # empty/None key sends no header, like the reference
            req.add_header("api-key", self.api_key)
        try:
            with self._opener.open(req, timeout=self.timeout) as resp:
                raw = resp.read()
                return resp.status, (json.loads(raw) if raw else None)
        except urllib.error.HTTPError as e:  # non-2xx
            raw = e.read()
            try:
                parsed = json.loads(raw) if raw else None
            except ValueError:
                parsed = raw.decode(errors="replace")
            return e.code, parsed

    def _with_retry(self, fn: Callable[[], tuple[int, object]], what: str):
        """Run `fn` with the reference's 5-attempt exponential backoff on
        network errors / 429 / 503 (src/vector_store.rs:207-145)."""
        for attempt in range(1, MAX_ATTEMPTS + 1):
            try:
                status, parsed = fn()
            except urllib.error.URLError as e:
                if attempt == MAX_ATTEMPTS:
                    raise UpstreamError(f"{what}: network error after {attempt} attempts: {e}")
                self._sleep(float(2 ** (attempt - 1)))
                continue
            if status in TRANSIENT_STATUSES and attempt < MAX_ATTEMPTS:
                self._sleep(float(2 ** (attempt - 1)))
                continue
            return status, parsed
        raise UpstreamError(f"{what}: exhausted {MAX_ATTEMPTS} attempts")

    # -- collection management --------------------------------------------

    def ensure_collection(self, dim: int, distance: str = "Cosine") -> None:
        """Create the collection if absent (src/vector_store.rs:147-199)."""
        path = f"/collections/{self.collection}"
        status, parsed = self._with_retry(
            lambda: self._request("GET", path), "ensure_collection"
        )
        if status == 200:
            return
        if status == 404:
            body = {"vectors": {"size": int(dim), "distance": distance}}
            cstatus, cparsed = self._with_retry(
                lambda: self._request("PUT", path, body), "create_collection"
            )
            if 200 <= cstatus < 300 or cstatus in (400, 409):
                # 400/409: concurrent creation race — already exists
                return
            raise UpstreamError(f"create_collection: status {cstatus}: {cparsed}")
        raise UpstreamError(f"ensure_collection: status {status}: {parsed}")

    # -- write -------------------------------------------------------------

    def upsert_points(self, points: list[dict]) -> None:
        """PUT one batch in the reference's upsert wire shape
        (src/vector_store.rs:232-247): {"points": [...]} → non-2xx is an
        API error after the transient-retry policy."""
        path = f"/collections/{self.collection}/points"
        status, parsed = self._with_retry(
            lambda: self._request("PUT", path, {"points": points}), "upsert"
        )
        if not (200 <= status < 300):
            raise UpstreamError(f"upsert: status {status}: {parsed}")


def push_ann_index(
    spark,
    index_path: str,
    client: AnnStoreClient,
    batch_size: int = 256,
    distance: str = "Cosine",
) -> dict:
    """Stream the written index (ann_sink.write_ann_index layout) into the
    external store: ensure the collection with the manifest's dimension,
    then upsert cell-by-cell batches. Returns push stats.

    Retries happen per batch inside the client; a partial failure leaves
    the store with a prefix of cells upserted — rerunning the push is safe
    because point ids are stable (idempotent upsert)."""
    from penr_oz_agent_memory_rust_spark.sources import ann_sink

    manifest = ann_sink.read_manifest(index_path)
    client.ensure_collection(manifest["dim"], distance=distance)
    n_batches = n_points = 0
    for body in ann_sink.iter_upsert_batches(spark, index_path, batch_size=batch_size):
        client.upsert_points(body["points"])
        n_batches += 1
        n_points += len(body["points"])
    return {
        "collection": client.collection,
        "batches": n_batches,
        "points": n_points,
        "dim": manifest["dim"],
        "manifest_points": manifest["n_points"],
    }


def push_batches(client: AnnStoreClient, batches: Iterable[dict]) -> int:
    """Push pre-built upsert bodies (e.g. from a streaming foreachBatch);
    returns the number of points pushed."""
    n = 0
    for body in batches:
        pts = body["points"] if isinstance(body, dict) else list(body)
        client.upsert_points(pts)
        n += len(pts)
    return n
