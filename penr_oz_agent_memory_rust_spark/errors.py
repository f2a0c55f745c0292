"""Error taxonomy mirroring the reference's AppError (reference src/error.rs).

The reference maps domain errors to HTTP statuses; the engine raises typed
Python exceptions at the API boundary instead. Status codes kept for parity
documentation.
"""

from __future__ import annotations


class EngineError(Exception):
    status = 500


class ValidationError(EngineError):
    """400 — empty text, reserved metadata key, malformed id (src/routes.rs:175-183,231-240)."""

    status = 400


class NotFoundError(EngineError):
    """404 — missing memory/session (src/routes.rs:460-471,568-585)."""

    status = 404


class AuthenticationError(EngineError):
    """401 — bad/missing API key (src/routes.rs:479-502)."""

    status = 401


class NotConfiguredError(EngineError):
    """503 — store/provider not configured (src/routes.rs:41-52)."""

    status = 503


class UpstreamError(EngineError):
    """502 — embedding provider / vector store failure (src/error.rs)."""

    status = 502
