"""Metrics layer: sink counters advance across a 2-batch pipeline
run, the streaming listener feeds input-row counters, retry hooks
count re-attempts, and the whole snapshot serves over HTTP next to
/health (the CloudWatch-wiring analog, KCLScheduler.java:101-125)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from sample_keyspaces_cdc_streams_connectors_spark.metrics import (
    MetricsRegistry,
    attach_metrics,
    counted_sink,
)
from sample_keyspaces_cdc_streams_connectors_spark.runtime import HealthServer
from sample_keyspaces_cdc_streams_connectors_spark.streaming import (
    CdcPipeline,
    PipelineConfig,
    memory_rows_sink,
)
from sample_keyspaces_cdc_streams_connectors_spark.streaming.retry import with_backoff, with_linear_retry


@pytest.fixture(scope="module")
def env_parquet(spark, envelopes, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("menv") / "envelopes")
    # two files -> two micro-batches under maxFilesPerTrigger=1
    envelopes.limit(120).repartition(2).write.parquet(path)
    schema = spark.read.parquet(path).schema
    return path, schema


def _run_pipeline(spark, env_parquet, sink, tmp_path, registry):
    # attach_metrics reuses one session-singleton listener (removing a
    # Python listener mid-flight can wedge the py4j callback bus) and
    # re-points it at this test's registry
    path, schema = env_parquet
    attach_metrics(spark, registry)
    pipe = CdcPipeline(PipelineConfig(checkpoint_dir=str(tmp_path / "ckpt")))
    q = pipe.start(pipe.read_envelope_stream(spark, path, schema), sink)
    assert q.awaitTermination(120)
    # listener events are delivered asynchronously on the listener
    # bus thread — poll briefly until the termination event lands
    import time

    for _ in range(100):
        snap = registry.snapshot()
        if (
            snap.get("streaming.queries_terminated", 0) >= 1
            and snap.get("streaming.records_in", 0) >= 120
        ):
            break
        time.sleep(0.1)


def test_counters_advance_across_two_batches(spark, env_parquet, tmp_path):
    reg = MetricsRegistry()
    store: list = []
    sink = counted_sink(memory_rows_sink(store), "mem", registry=reg)
    _run_pipeline(spark, env_parquet, sink, tmp_path, reg)

    rows_delivered = sum(len(rows) for _, rows in store)
    assert rows_delivered == 120
    snap = reg.snapshot()
    assert snap["sink.mem.batches"] >= 2  # one per file trigger
    assert snap["sink.mem.records_out"] == rows_delivered
    assert snap["sink.mem.bytes_out"] > 0
    assert "sink.mem.failed_batches" not in snap
    # listener side: the same run fed streaming.* counters
    assert snap["streaming.queries_started"] >= 1
    assert snap["streaming.records_in"] >= 120
    assert snap["streaming.batches"] >= 2
    assert snap["streaming.queries_terminated"] >= 1
    assert "streaming.queries_failed" not in snap


def test_failed_batch_counts_and_reraises(spark, env_parquet, tmp_path):
    reg = MetricsRegistry()

    def boom(batch_df, batch_id):
        batch_df.count()
        raise RuntimeError("sink down")

    sink = counted_sink(boom, "boom", registry=reg)
    path, schema = env_parquet
    pipe = CdcPipeline(PipelineConfig(checkpoint_dir=str(tmp_path / "c2")))
    q = pipe.start(pipe.read_envelope_stream(spark, path, schema), sink)
    failed = False
    try:
        q.awaitTermination(120)
    except Exception:
        failed = True
    assert failed, "a failing sink must fail the query"
    assert reg.get("sink.boom.failed_batches") >= 1
    assert reg.get("sink.boom.batches") == 0


def test_queue_sink_accumulator_counters(spark, env_parquet, tmp_path):
    """The distributed queue sink's foreachPartition action bypasses
    SQL observed metrics; its native accumulator counters must record
    messages/records/bytes sent."""
    from sample_keyspaces_cdc_streams_connectors_spark.streaming import local_dir_transport
    from sample_keyspaces_cdc_streams_connectors_spark.streaming.sinks import queue_sink

    reg = MetricsRegistry()
    out = str(tmp_path / "q")
    sink = queue_sink(
        lambda: local_dir_transport(out),
        registry=reg,
        metrics_name="queue",
    )
    path, schema = env_parquet
    pipe = CdcPipeline(PipelineConfig(checkpoint_dir=str(tmp_path / "c3")))
    q = pipe.start(pipe.read_envelope_stream(spark, path, schema), sink)
    assert q.awaitTermination(120)

    import glob

    lines = sum(
        1 for f in glob.glob(f"{out}/*.jsonl") for _ in open(f)
    )
    assert lines == 120
    snap = reg.snapshot()
    assert snap["sink.queue.records_out"] == 120
    assert 1 <= snap["sink.queue.messages_out"] <= 120
    assert snap["sink.queue.bytes_out"] > 0
    assert snap["sink.queue.batches"] >= 2
    assert "sink.queue.failed_batches" not in snap


def test_retry_hooks_count_reattempts():
    reg = MetricsRegistry()
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("ThrottlingException")
        return "ok"

    wrapped = with_backoff(
        flaky,
        max_retries=5,
        sleep=lambda s: None,
        on_retry=lambda: reg.inc("retry.backoff"),
    )
    assert wrapped() == "ok"
    assert reg.get("retry.backoff") == 2

    calls["n"] = 0
    wrapped2 = with_linear_retry(
        flaky,
        max_retries=4,
        sleep=lambda s: None,
        on_retry=lambda: reg.inc("retry.linear"),
    )
    assert wrapped2() == "ok"
    assert reg.get("retry.linear") == 2


def test_metrics_served_over_http():
    reg = MetricsRegistry()
    reg.inc("sink.s3.records_out", 42)
    reg.inc("streaming.batches", 7)
    server = HealthServer(port=0, metrics=reg).start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        with urllib.request.urlopen(f"{base}/health", timeout=5) as r:
            assert r.status == 200 and r.read() == b"OK"
        with urllib.request.urlopen(f"{base}/metrics", timeout=5) as r:
            assert r.status == 200
            body = json.loads(r.read())
        assert body == {"sink.s3.records_out": 42, "streaming.batches": 7}
        # counters keep advancing between scrapes
        reg.inc("streaming.batches", 1)
        with urllib.request.urlopen(f"{base}/metrics", timeout=5) as r:
            assert json.loads(r.read())["streaming.batches"] == 8
    finally:
        server.stop()


def test_metrics_endpoint_absent_without_registry():
    server = HealthServer(port=0).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/metrics", timeout=5
            )
        assert exc.value.code == 404
    finally:
        server.stop()


def test_retry_counts_default_to_registry(monkeypatch):
    """No caller plumbing: a with_backoff/with_linear_retry wrapper
    built WITHOUT on_retry counts re-attempts into DEFAULT_REGISTRY
    (overridable per call via registry=/metric=)."""
    from sample_keyspaces_cdc_streams_connectors_spark import metrics as m

    reg = MetricsRegistry()
    monkeypatch.setattr(m, "DEFAULT_REGISTRY", reg)

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("ThrottlingException")
        return "ok"

    assert with_backoff(flaky, sleep=lambda s: None)() == "ok"
    assert reg.get("retry.backoff") == 2

    calls.clear()
    assert with_linear_retry(flaky, sleep=lambda s: None)() == "ok"
    assert reg.get("retry.linear") == 2

    # explicit registry + metric override
    reg2 = MetricsRegistry()
    calls.clear()
    with_backoff(
        flaky, sleep=lambda s: None, metric="retry.custom", registry=reg2
    )()
    assert reg2.get("retry.custom") == 2
    assert reg.get("retry.custom") == 0


def test_mv_sink_retries_surface_in_metrics(
    spark, envelopes, tmp_path, monkeypatch
):
    """An injected transient write failure inside the MV sink is
    retried under the linear policy and counted as retry.mv_sink —
    and the view still converges to the correct contents."""
    from sample_keyspaces_cdc_streams_connectors_spark.operators.mv import mv_apply
    from sample_keyspaces_cdc_streams_connectors_spark.streaming import sinks

    env = envelopes.limit(100)
    src = str(tmp_path / "src")
    env.repartition(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    reg = MetricsRegistry()
    real = sinks._mv_write_version
    fails = {"n": 2}

    def flaky(latest, new_dir):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise RuntimeError("ServiceUnavailableException (injected)")
        real(latest, new_dir)

    monkeypatch.setattr(sinks, "_mv_write_version", flaky)

    view_dir = str(tmp_path / "view")
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .writeStream.foreachBatch(
            sinks.materialized_view_sink(
                view_dir,
                pk=["user_id"],
                fields=["event_type", "value"],
                registry=reg,
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert reg.get("retry.mv_sink") == 2
    got = {
        r.user_id: (r.event_type, r.value)
        for r in sinks.read_materialized_view(spark, view_dir).collect()
    }
    expect = {
        r.user_id: (r.event_type, r.value)
        for r in mv_apply(
            spark.read.parquet(src),
            pk=["user_id"],
            fields=["event_type", "value"],
        ).collect()
    }
    assert got == expect and expect


def _put_factory(out_dir):
    """Picklable factory closure (cloudpickle serializes nested
    functions by value): first call per partition raises a transient
    marker, later calls record batch lengths to a temp dir."""

    def make():
        state = {"failed": False}

        def put(batch):
            import os
            import uuid

            if not state["failed"]:
                state["failed"] = True
                raise RuntimeError("ThrottlingException: injected")
            with open(
                os.path.join(out_dir, uuid.uuid4().hex), "w"
            ) as fh:
                fh.write(str(len(batch)))

        return put

    return make


def test_vector_upsert_sink_counts_retries_and_vectors(spark, tmp_path):
    """Executor-side put retries ride an accumulator into the
    driver-side registry: one throttle per partition -> retry count =
    n_partitions, all vectors delivered."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.vectorstore import vector_upsert_sink

    out = tmp_path / "puts"
    out.mkdir()
    reg = MetricsRegistry()
    df = (
        spark.range(40)
        .selectExpr(
            "cast(id as string) as key",
            "array(cast(id as float), 1.0f) as emb",
        )
        .repartition(2)
    )
    sink = vector_upsert_sink(
        _put_factory(str(out)),
        key_field="key",
        embedding_col="emb",
        batch_size=7,
        registry=reg,
        retry_kwargs={"base": 0.001, "cap": 0.002},
    )
    sink(df, 0)
    assert reg.get("retry.vectorstore") == 2  # one throttle per partition
    assert reg.get("sink.vectors.batches") == 1
    assert reg.get("sink.vectors.vectors_out") == 40
    delivered = sum(
        int(p.read_text()) for p in out.iterdir()
    )
    assert delivered == 40
