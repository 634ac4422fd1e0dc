"""Executor-side queue sink (the DEFAULT queue_sink): bodies never
visit the driver; per-partition transports; task failure semantics."""

from __future__ import annotations

import glob
import json
import os
import uuid

import pytest

from sample_keyspaces_cdc_streams_connectors_spark.operators import shape_output
from sample_keyspaces_cdc_streams_connectors_spark.streaming.sinks import (
    QueueTransport,
    queue_sink,
)


def _dir_factory(out_dir: str):
    """Picklable factory: each partition writes its own jsonl files."""

    def make() -> QueueTransport:
        os.makedirs(out_dir, exist_ok=True)

        def send(batch):
            path = os.path.join(out_dir, f"p{os.getpid()}-{uuid.uuid4().hex}.jsonl")
            with open(path, "w", encoding="utf-8") as fh:
                fh.write("\n".join(m.body for m in batch) + "\n")
            return []

        return QueueTransport(send_batch=send)

    return make


def test_all_records_delivered(spark, envelopes, tmp_path):
    out = str(tmp_path / "q")
    batch = shape_output(envelopes.limit(120)).repartition(4)
    queue_sink(_dir_factory(out), max_message_size=1024)(batch, 0)
    recs = [
        json.loads(line)
        for f in glob.glob(f"{out}/*.jsonl")
        for line in open(f)
        if line.strip()
    ]
    assert len(recs) == 120
    seqs = {r["stream_sequence_number"] for r in recs}
    assert len(seqs) == 120  # no duplicates, nothing lost


def test_failure_propagates_to_driver(spark, envelopes, tmp_path):
    def bad_factory() -> QueueTransport:
        def send(batch):
            return list(range(len(batch)))  # everything fails

        return QueueTransport(send_batch=send)

    batch = shape_output(envelopes.limit(20))
    with pytest.raises(Exception, match="messages failed"):
        queue_sink(bad_factory)(batch, 0)


def test_distributed_delay_seconds_on_entries(spark, envelopes, tmp_path):
    """delay-seconds reaches every entry on the executor-side path."""
    out = str(tmp_path / "delays")

    def make() -> QueueTransport:
        os.makedirs(out, exist_ok=True)

        def send(batch):
            path = os.path.join(out, f"{uuid.uuid4().hex}.txt")
            with open(path, "w", encoding="utf-8") as fh:
                fh.write("\n".join(str(m.delay_seconds) for m in batch))
            return []

        return QueueTransport(send_batch=send)

    batch = shape_output(envelopes.limit(60)).repartition(3)
    queue_sink(make, max_message_size=1024, delay_seconds=30)(batch, 0)
    delays = {
        line
        for f in glob.glob(f"{out}/*.txt")
        for line in open(f).read().splitlines()
        if line
    }
    assert delays == {"30"}
