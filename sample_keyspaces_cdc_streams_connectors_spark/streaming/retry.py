"""Retry policies for sink/transport calls.

Reference policies reproduced:

- **Exponential backoff with jitter** (Bedrock path,
  ``VectorHelper.java:25-97``): base 1000 ms, ×2.0 per attempt,
  capped at 10 000 ms, ±5% jitter (``delay * 0.1 * (U[0,1) - 0.5)``),
  retried only for transient-marker messages
  (``shouldRetry``, ``VectorHelper.java:78-97``).
- **Linear retry** (MV sink, ``KeyspacesViewTargetMapper.java:136-149``):
  ``sleep(10 ms * attempt)`` up to ``max-retries``.

Spark context: task-level retries already exist; these wrappers are
for *driver-side* transports inside ``foreachBatch`` (queue sends,
model endpoints) where a failed call should back off without failing
the micro-batch.  The sleeper and RNG are injectable so tests assert
the exact delay sequence without sleeping.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from typing import Any, TypeVar

T = TypeVar("T")

#: transient-error markers (VectorHelper.shouldRetry, :78-97)
RETRYABLE_MARKERS = (
    "ThrottlingException",
    "ServiceUnavailableException",
    "InternalServerError",
    "RequestTimeoutException",
    "TooManyRequestsException",
    "502",
    "503",
    "504",
)

BASE_DELAY_S = 1.0  # VectorHelper.java:26
MAX_DELAY_S = 10.0  # :27
BACKOFF_MULTIPLIER = 2.0  # :28
JITTER_FACTOR = 0.1  # :29


def is_retryable(exc: Exception) -> bool:
    """Message-marker classification (null message -> not retryable)."""
    message = str(exc) if exc.args else None
    if not message:
        return False
    return any(marker in message for marker in RETRYABLE_MARKERS)


def backoff_delay(
    attempt: int,
    base: float = BASE_DELAY_S,
    multiplier: float = BACKOFF_MULTIPLIER,
    cap: float = MAX_DELAY_S,
    jitter: float = JITTER_FACTOR,
    rng: random.Random | None = None,
) -> float:
    """Delay for 0-based ``attempt``: min(base*mult^n, cap) ± jitter/2,
    floored at 0 (VectorHelper.calculateBackoffDelay, :60-73)."""
    delay = min(base * multiplier**attempt, cap)
    u = (rng or random).random()
    return max(0.0, delay + delay * jitter * (u - 0.5))


def _default_counter(metric: str, registry=None) -> Callable[[], None]:
    """Count re-attempts into the metrics registry — the DEFAULT
    ``on_retry`` hook, so retries surface on ``GET /metrics`` without
    caller plumbing.  Lazy import (metrics pulls in pyspark.sql;
    retry itself stays importable without a session)."""

    def count() -> None:
        from sample_keyspaces_cdc_streams_connectors_spark.metrics import DEFAULT_REGISTRY

        (registry or DEFAULT_REGISTRY).inc(metric)

    return count


def with_backoff(
    fn: Callable[..., T],
    max_retries: int = 3,
    retryable: Callable[[Exception], bool] = is_retryable,
    sleep: Callable[[float], None] = time.sleep,
    rng: random.Random | None = None,
    on_retry: Callable[[], None] | None = None,
    metric: str = "retry.backoff",
    registry=None,
    **delay_kwargs: Any,
) -> Callable[..., T]:
    """Wrap ``fn`` with the Bedrock retry loop: up to ``max_retries``
    re-attempts, backoff between them, non-retryable errors and
    exhaustion re-raise the last exception (VectorHelper:114-169).
    ``on_retry`` fires once per RE-attempt; by DEFAULT it increments
    ``metric`` in ``registry`` (falling back to the process
    :data:`~sample_keyspaces_cdc_streams_connectors_spark.metrics.DEFAULT_REGISTRY`), so every
    engine retry shows up on ``GET /metrics`` with no caller
    plumbing.  Pass an explicit ``on_retry`` to override (it
    replaces, not augments, the default counter)."""

    notify = on_retry if on_retry is not None else _default_counter(
        metric, registry
    )

    def call(*args: Any, **kwargs: Any) -> T:
        last: Exception | None = None
        for attempt in range(max_retries + 1):
            try:
                return fn(*args, **kwargs)
            except Exception as e:  # noqa: BLE001
                last = e
                if attempt < max_retries and retryable(e):
                    notify()
                    sleep(backoff_delay(attempt, rng=rng, **delay_kwargs))
                else:
                    break
        raise RuntimeError(
            f"failed after {max_retries + 1} attempts"
        ) from last

    return call


def with_linear_retry(
    fn: Callable[..., T],
    max_retries: int = 3,
    step_s: float = 0.010,
    sleep: Callable[[float], None] = time.sleep,
    on_retry: Callable[[], None] | None = None,
    metric: str = "retry.linear",
    registry=None,
) -> Callable[..., T]:
    """MV-sink policy: retry everything, sleep(step*attempt) between
    attempts (KeyspacesViewTargetMapper.java:136-149).  ``on_retry``
    fires once per re-attempt; defaults to counting ``metric`` in the
    metrics registry (same contract as :func:`with_backoff`)."""
    notify = on_retry if on_retry is not None else _default_counter(
        metric, registry
    )

    def call(*args: Any, **kwargs: Any) -> T:
        last: Exception | None = None
        for attempt in range(1, max_retries + 1):
            try:
                return fn(*args, **kwargs)
            except Exception as e:  # noqa: BLE001
                last = e
                if attempt < max_retries:
                    notify()
                    sleep(step_s * attempt)
        raise RuntimeError(f"failed after {max_retries} attempts") from last

    return call
