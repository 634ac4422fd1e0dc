"""Metrics layer — the engine's CloudWatch analog.

The reference wires CloudWatch into the KCL scheduler
(KCLScheduler.java:101-125 builds the CloudWatch client; lease and
processing metrics come free with KCL).  The Spark engine's
counterpart is three pieces:

- :class:`MetricsRegistry` — thread-safe named counters.
- :func:`counted_sink` — wraps any ``(batch_df, batch_id)`` sink with
  records-out / bytes-out / batch / failed-batch counters.  Row and
  byte counts ride the sink's OWN action via ``DataFrame.observe``
  (aggregates computed inside the existing scan) — metrics never add
  a second job over the data.
- :class:`EngineStreamingListener` — a ``StreamingQueryListener``
  feeding per-query input-rows / batch / failure counters from
  Structured Streaming progress events.

Retry counts come from the ``on_retry`` hook in
:mod:`.streaming.retry`, and the whole snapshot is served over HTTP
next to ``/health`` (``GET /metrics``) by
:class:`~sample_keyspaces_cdc_streams_connectors_spark.runtime.HealthServer`.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


class MetricsRegistry:
    """Thread-safe monotonically-increasing counters.

    Counter names are dotted strings (``sink.s3.records_out``); values
    are ints (counts) or floats (sums).  One registry per process is
    the normal shape (:data:`DEFAULT_REGISTRY`), injectable everywhere
    for tests.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: dict[str, float] = {}

    def inc(self, name: str, n: float = 1) -> None:
        if n is None:  # observed sum over an empty batch
            return
        with self._lock:
            self._counters[name] = self._counters.get(name, 0) + n

    def get(self, name: str) -> float:
        with self._lock:
            return self._counters.get(name, 0)

    def snapshot(self) -> dict[str, float]:
        with self._lock:
            return dict(self._counters)

    def reset(self) -> None:
        with self._lock:
            self._counters.clear()


#: process-default registry (what the CLI runtime exposes on /metrics)
DEFAULT_REGISTRY = MetricsRegistry()


def counted_sink(
    inner: Callable[[DataFrame, int], None],
    name: str,
    registry: MetricsRegistry | None = None,
    bytes_of: Callable[[DataFrame], Column] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch sink with per-batch counters.

    Emits ``sink.<name>.batches``, ``.failed_batches``,
    ``.records_out`` and ``.bytes_out``.  Counts are attached to the
    batch frame with ``observe`` and materialize during the action the
    INNER sink runs — no extra scan, no ``.count()`` job.  The inner
    sink must consume the frame it is handed (every engine sink does);
    a sink exception increments ``failed_batches`` and re-raises, so
    the delivery contract (failed batch -> no checkpoint advance) is
    untouched.

    ``bytes_of`` maps the batch frame to a per-row byte-size column;
    the default measures the JSON wire size of the full row (the same
    serialization the queue/object sinks ship), which costs one
    ``to_json`` per row in the metrics aggregate.  Pass a cheaper
    column (e.g. ``F.length("body")``) or ``F.lit(0)`` to opt down.

    Caveat: observed metrics fire only for *DataFrame* actions.  A
    sink whose only action goes through the RDD layer (e.g.
    ``foreachPartition``) never completes the observation, so the
    fetch below is a bounded poll, not a blocking ``obs.get`` —
    records/bytes are then simply not recorded for that batch
    (``batches`` still advances).  Such sinks should count natively
    with accumulators instead (see ``queue_sink(registry=...)``).
    """
    reg = registry or DEFAULT_REGISTRY

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        size = (
            bytes_of(batch_df)
            if bytes_of is not None
            else F.octet_length(F.to_json(F.struct(*batch_df.columns)))
        )
        obs = Observation()
        observed = batch_df.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.sum(size.cast("bigint")).alias("bytes"),
        )
        try:
            inner(observed, batch_id)
        except Exception:
            reg.inc(f"sink.{name}.failed_batches")
            raise
        reg.inc(f"sink.{name}.batches")
        got = _observed_row(obs)
        if got is not None:
            reg.inc(f"sink.{name}.records_out", got["rows"])
            reg.inc(f"sink.{name}.bytes_out", got["bytes"])

    return sink


def _observed_row(obs: Observation, wait_s: float = 2.0) -> dict | None:
    """Bounded-poll fetch of an observation's metrics row.

    ``Observation.get`` blocks FOREVER when the observed frame's only
    action bypassed the SQL execution listener (RDD actions), and the
    QueryExecutionListener that completes the observation fires
    asynchronously even for DataFrame actions — hence: poll the
    non-blocking JVM ``getRowOrEmpty`` for up to ``wait_s``, return
    None if the metrics never materialize."""
    import time

    from pyspark.serializers import CPickleSerializer

    deadline = time.monotonic() + wait_s
    while True:
        jo = obs._jo
        if jo is not None:
            opt = jo.getRowOrEmpty()
            if opt.isDefined():
                utils = getattr(
                    obs._jvm, "org.apache.spark.sql.api.python.PythonSQLUtils"
                )
                row = CPickleSerializer().loads(utils.toPyRow(opt.get()))
                return row.asDict(recursive=False)
        if time.monotonic() >= deadline:
            return None
        time.sleep(0.05)


class EngineStreamingListener(StreamingQueryListener):
    """Streaming progress → counters (the KCL processing-metrics
    analog).  Attach with :func:`attach_metrics`; counters:

    - ``streaming.queries_started`` / ``.queries_terminated`` /
      ``.queries_failed``
    - ``streaming.batches`` — one per progress event
    - ``streaming.records_in`` — source rows entering each batch
    """

    def __init__(self, registry: MetricsRegistry | None = None) -> None:
        self.registry = registry or DEFAULT_REGISTRY

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        self.registry.inc("streaming.queries_started")

    def onQueryProgress(self, event) -> None:  # noqa: N802
        self.registry.inc("streaming.batches")
        self.registry.inc("streaming.records_in", event.progress.numInputRows)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.registry.inc("streaming.queries_terminated")
        if event.exception is not None:
            self.registry.inc("streaming.queries_failed")


#: one listener per SparkSession (by applicationId) — see attach_metrics
_LISTENERS: dict[str, EngineStreamingListener] = {}


def attach_metrics(
    spark: SparkSession, registry: MetricsRegistry | None = None
) -> EngineStreamingListener:
    """Attach an :class:`EngineStreamingListener` to the session —
    ONCE.  Python streaming listeners ride the py4j callback channel,
    and removing one while the JVM bus still has its events in flight
    can wedge the channel; so the engine registers a single listener
    per SparkSession and never removes it.  Re-attaching swaps the
    registry the existing listener writes to (events are read through
    ``listener.registry`` at delivery time)."""
    key = spark.sparkContext.applicationId
    listener = _LISTENERS.get(key)
    if listener is None:
        listener = EngineStreamingListener(registry)
        spark.streams.addListener(listener)
        _LISTENERS[key] = listener
    else:
        listener.registry = registry or DEFAULT_REGISTRY
    return listener
