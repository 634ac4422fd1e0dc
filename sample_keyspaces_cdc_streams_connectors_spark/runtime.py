"""Worker runtime plumbing: health endpoint, worker identity, and
stream discovery.

Ports the reference's operational shell around the per-worker
processor:

- Health endpoint (HealthServer.java:10-28): a single-threaded HTTP
  server answering ``GET /health`` with ``200 OK`` — used by container
  orchestrators' liveness probes.  Here it runs on a daemon thread so
  a driver process can expose liveness while Structured Streaming
  queries run.
- Worker identity (AWSHelpers.java:20-52): a compact per-worker id of
  the form ``sts:<session-or-arn tail>-<millis>`` derived from the
  caller-identity ARN, falling back to a random GUID when no identity
  provider is available.  The STS call itself is cloud plumbing; it is
  injected as a callable so the derivation logic (session-name
  extraction, 256-char shortening, millis suffix, GUID fallback) is
  real and tested without AWS.
- Stream discovery (KeyspacesConfig.java:174-215): pick a stream ARN
  for (keyspace, table[, stream label]) from a stream listing, with a
  pre-configured ARN short-circuiting discovery.  The listing call is
  injected (in production a Keyspaces Streams ``ListStreams`` pager);
  the selection semantics — case-insensitive match, label filter only
  when a label is configured, first match wins, errors -> None — are
  the reference's.
"""

from __future__ import annotations

import logging
import re
import threading
import time
import uuid
from collections.abc import Callable, Iterable
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

logger = logging.getLogger(__name__)

_SESSION_RE = re.compile(r"assumed-role/[^/]+/([^/]+)$")


class HealthServer:
    """``GET /health`` -> ``200 OK`` liveness endpoint
    (HealthServer.java:10-28; the reference binds :8080 and serves
    single-threaded — pass ``port=0`` in tests for an ephemeral one).

    When a ``metrics`` registry is supplied (any object with a
    ``snapshot() -> dict`` — normally
    :class:`~sample_keyspaces_cdc_streams_connectors_spark.metrics.MetricsRegistry`),
    ``GET /metrics`` serves its counters as JSON next to the liveness
    probe — the engine's stand-in for the reference's CloudWatch
    wiring (KCLScheduler.java:101-125).
    """

    def __init__(self, port: int = 8080, metrics=None) -> None:
        import json as _json

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                if self.path == "/health":
                    body = b"OK"
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/metrics" and metrics is not None:
                    body = _json.dumps(
                        metrics.snapshot(), sort_keys=True
                    ).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_error(404)

            def log_message(self, *args) -> None:  # quiet
                pass

        self._server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "HealthServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)


def _extract_session_name(arn: str) -> str:
    """``arn:...:assumed-role/<role>/<session>`` -> ``<session>``;
    the full ARN when the pattern doesn't match
    (AWSHelpers.java:42-47)."""
    m = _SESSION_RE.search(arn)
    return m.group(1) if m else arn


def _short_id(s: str | None) -> str:
    """Last 256 characters (AWSHelpers.java:48-52)."""
    if s is None:
        return ""
    return s[-256:] if len(s) > 256 else s


def create_worker_id(
    identity_arn_provider: Callable[[], str] | None = None,
    clock_ms: Callable[[], int] | None = None,
) -> str:
    """Compact worker id, ``sts:<session-name tail>-<millis>``
    (AWSHelpers.java:20-41).

    ``identity_arn_provider`` stands in for the STS
    ``GetCallerIdentity`` call; any exception (or no provider) falls
    back to a random GUID, exactly like the reference's
    SdkClientException path.
    """
    if identity_arn_provider is not None:
        try:
            arn = identity_arn_provider()
            sess = _extract_session_name(arn)
            now = clock_ms() if clock_ms else int(time.time() * 1000)
            return f"sts:{_short_id(sess)}-{now}"
        except Exception:
            logger.exception("Error getting caller identity")
    guid = str(uuid.uuid4())
    logger.error("Error getting caller identity, using random GUID: %s", guid)
    return guid


@dataclass(frozen=True)
class StreamDescriptor:
    """One entry of a stream listing (the fields the reference's
    selection loop reads, KeyspacesConfig.java:193-206)."""

    stream_arn: str
    keyspace_name: str
    table_name: str
    stream_label: str = ""


def get_stream_arn(
    keyspace_name: str,
    table_name: str,
    stream_label: str | None = None,
    configured_arn: str | None = None,
    list_streams: Callable[[], Iterable[StreamDescriptor]] | None = None,
) -> str | None:
    """Resolve the stream ARN for (keyspace, table[, label])
    (KeyspacesConfig.java:174-215).

    A pre-configured ARN wins without any listing call; otherwise the
    first stream matching keyspace+table case-insensitively — and the
    label too, when one is configured — is returned.  Errors and
    no-match both yield ``None`` (the reference logs and returns
    null).
    """
    if configured_arn:
        return configured_arn
    if list_streams is None:
        return None
    try:
        for s in list_streams():
            if (
                s.keyspace_name.casefold() != keyspace_name.casefold()
                or s.table_name.casefold() != table_name.casefold()
            ):
                continue
            if stream_label:
                if s.stream_label.casefold() == stream_label.casefold():
                    return s.stream_arn
            else:
                return s.stream_arn
    except Exception:
        logger.exception(
            "Error getting stream ARN for keyspace: %s, table: %s",
            keyspace_name,
            table_name,
        )
    return None
