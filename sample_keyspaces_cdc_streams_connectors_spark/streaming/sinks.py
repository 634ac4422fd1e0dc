"""foreachBatch sink implementations — the connector layer.

Each reference connector becomes a small ``(batch_df, batch_id)``
callable built from the shared batching operators; cloud clients are
behind injectable transports so tests run with local fakes (the
reference's Mockito seam, SQSTargetMapperTest.java:79-96, moved to
constructor injection).

Delivery contract: a sink exception fails the micro-batch → the
checkpoint does not advance → redelivery (at-least-once), and file
names derived from sequence ranges make redelivery idempotent —
exactly the reference's `firstSeq-lastSeq` object naming
(S3TargetMapper.java:119-176).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.operators.batching import (
    DEFAULT_MAX_MESSAGE_SIZE,
    assign_messages,
    time_partition,
)

SQS_BATCH_SIZE = 10  # SQSTargetMapper.java:90


class PartialFailureError(RuntimeError):
    """Some messages in a batch failed (PartialFailureException.java:27-47)."""

    def __init__(self, failed: int, succeeded: int):
        super().__init__(f"{failed} failed, {succeeded} succeeded")
        self.failed, self.succeeded = failed, succeeded


class AllItemsFailureError(RuntimeError):
    """Every message failed (AllItemsFailureException.java:26-46)."""


_AVRO_AVAILABLE: bool | None = None


def _avro_available(spark) -> bool:
    """The avro data source is an external Spark module; gate on a
    one-time probe (absent in this container — parquet fallback)."""
    global _AVRO_AVAILABLE
    if _AVRO_AVAILABLE is None:
        try:
            spark._jvm.org.apache.spark.sql.avro.AvroFileFormat  # noqa: B018
            _AVRO_AVAILABLE = True
        except Exception:
            _AVRO_AVAILABLE = False
    return _AVRO_AVAILABLE


def object_store_sink(
    out_dir: str,
    ts_col: str = "stream_arrival_timestamp",
    granularity: str = "hours",
    output_format: str = "json",
) -> Callable[[DataFrame, int], None]:
    """S3-object-sink analog (S3TargetMapper.java:70-179): files under
    a time-partitioned path, format ``json`` | ``avro`` | ``parquet``
    (the reference default is avro, S3TargetMapper.java:70-76; when the
    external spark-avro module is absent, avro falls back to parquet —
    the same self-describing-container role).

    Uses the distributed writer (no driver collect): partition path
    columns + ``partitionBy`` give `prefix/YYYY/MM/...` layout; file
    contents are the shaped records.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ts = (F.col(ts_col) / 1000).cast("timestamp")
        with_part = batch_df.withColumn(
            "__part", time_partition(ts, granularity)
        )
        writer = with_part.write.mode("append").partitionBy("__part")
        if output_format == "json":
            writer.json(out_dir)
        elif output_format == "avro" and _avro_available(
            batch_df.sparkSession
        ):
            writer.format("avro").save(out_dir)
        else:
            writer.parquet(out_dir)

    return sink


@dataclass
class QueueTransport:
    """Injectable message transport (SQS stand-in). ``send_batch``
    returns the list of failed indexes (empty = all ok)."""

    send_batch: Callable[[list[str]], list[int]]


def local_dir_transport(out_dir: str) -> QueueTransport:
    """Default local transport: each message batch appended as one
    JSON-lines file (deterministic name per call order)."""
    os.makedirs(out_dir, exist_ok=True)
    counter = {"n": 0}

    def send(batch: list[str]) -> list[int]:
        path = os.path.join(out_dir, f"batch-{counter['n']:06d}.jsonl")
        counter["n"] += 1
        with open(path, "a", encoding="utf-8") as fh:
            for m in batch:
                fh.write(m + "\n")
        return []

    return QueueTransport(send_batch=send)


def queue_sink(
    transport: QueueTransport,
    shard_col: str = "stream_keyspace_name",
    seq_col: str = "stream_sequence_number",
    max_message_size: int = DEFAULT_MAX_MESSAGE_SIZE,
    max_records: int = -1,
) -> Callable[[DataFrame, int], None]:
    """SQS-sink analog (SQSTargetMapper.java:76-155): serialize to
    JSON, size-bound into messages, send in batches of 10; raise
    PartialFailure/AllItemsFailure like the reference.

    The per-message grouping runs distributed (window over shard);
    only the final bounded message strings stream back to the driver
    for transport (SQS is a driver-side-throughput service anyway —
    at real scale use foreachPartition with an executor-side client,
    which this structure permits by swapping collect for
    toLocalIterator/foreachPartition).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        payload = batch_df.withColumn(
            "__json", F.to_json(F.struct(*batch_df.columns))
        )
        sized = assign_messages(
            payload,
            shard_col=shard_col,
            seq_col=seq_col,
            size_col=F.length("__json").cast("bigint"),
            max_message_size=max_message_size,
            max_records=max_records,
        )
        messages = (
            sized.groupBy(shard_col, "message_idx", "message_id")
            .agg(F.concat_ws("\n", F.collect_list("__json")).alias("body"))
            .orderBy(shard_col, "message_idx")
        )
        bodies = [r.body for r in messages.toLocalIterator()]
        failed = total = 0
        for i in range(0, len(bodies), SQS_BATCH_SIZE):
            chunk = bodies[i : i + SQS_BATCH_SIZE]
            total += len(chunk)
            failed += len(transport.send_batch(chunk))
        if failed and failed == total:
            raise AllItemsFailureError(f"all {total} messages failed")
        if failed:
            raise PartialFailureError(failed, total - failed)

    return sink


def queue_sink_distributed(
    transport_factory: Callable[[], QueueTransport],
    shard_col: str = "stream_keyspace_name",
    seq_col: str = "stream_sequence_number",
    max_message_size: int = DEFAULT_MAX_MESSAGE_SIZE,
    max_records: int = -1,
) -> Callable[[DataFrame, int], None]:
    """The 100 TB path of :func:`queue_sink`: message bodies never
    visit the driver — each partition opens its own transport (the
    per-executor client-singleton pattern, S3VectorTargetMapper.java:
    183-190) and sends its messages in batches of 10.

    ``transport_factory`` must be picklable and is invoked once per
    partition on the executor.  A send failure raises in the task →
    Spark retries the task → if retries exhaust, the micro-batch fails
    and the checkpoint does not advance (same at-least-once contract).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        payload = batch_df.withColumn(
            "__json", F.to_json(F.struct(*batch_df.columns))
        )
        sized = assign_messages(
            payload,
            shard_col=shard_col,
            seq_col=seq_col,
            size_col=F.length("__json").cast("bigint"),
            max_message_size=max_message_size,
            max_records=max_records,
        )
        messages = sized.groupBy(shard_col, "message_idx", "message_id").agg(
            F.concat_ws("\n", F.collect_list("__json")).alias("body")
        )

        def send_partition(rows) -> None:
            transport = None
            bodies: list[str] = []

            def flush() -> None:
                if bodies:
                    failed = transport.send_batch(list(bodies))
                    if failed:
                        raise RuntimeError(
                            f"{len(failed)}/{len(bodies)} messages failed"
                        )
                    bodies.clear()

            for row in rows:
                if transport is None:
                    transport = transport_factory()
                bodies.append(row.body)
                if len(bodies) == SQS_BATCH_SIZE:
                    flush()
            if transport is not None:
                flush()

        messages.foreachPartition(send_partition)

    return sink


def console_sink(num_rows: int = 20) -> Callable[[DataFrame, int], None]:
    """Default/log sink (DefaultKeyspacesTargetMapper.java:31-38)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.show(num_rows, truncate=False)

    return sink


def materialized_view_sink(
    view_dir: str,
    pk: Sequence[str],
    fields: Sequence[str],
    seq_col: str = "metadata.stream_sequence_number",
) -> Callable[[DataFrame, int], None]:
    """Keyspaces materialized-view sink analog
    (KeyspacesViewTargetMapper.java:81-154): maintains a parquet table
    under ``view_dir`` by merging each micro-batch of classified CDC
    envelopes with last-writer-wins semantics.

    Plan per batch: current view (rows tagged with their last-applied
    sequence) UNION batch events → one window by pk → keep the
    highest-sequence row, dropping keys whose winner is a
    delete-class op — the same single-shuffle reconstruction as
    ``operators.mv.mv_apply``, made incremental.  The write lands in a
    versioned subdirectory and a marker file flips atomically, so a
    failed batch never corrupts the readable view (idempotent under
    at-least-once redelivery: replaying a batch yields the same
    winners).
    """
    from sample_keyspaces_cdc_streams_connectors_spark.operators.mv import mv_apply

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        marker = os.path.join(view_dir, "_CURRENT")
        current_path = None
        if os.path.exists(marker):
            with open(marker, encoding="utf-8") as fh:
                current_path = fh.read().strip()

        # batch winners: (pk, fields, seq, is_delete) from the envelope
        batch_state = mv_apply(
            batch_df, pk=pk, fields=fields, seq_col=seq_col,
            keep_seq=True, keep_deletes=True,
        )
        if current_path:
            prior = spark.read.parquet(current_path)
            merged = prior.unionByName(batch_state)
        else:
            merged = batch_state
        from pyspark.sql import Window

        w = Window.partitionBy(*pk).orderBy(F.col("__seq").desc())
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        new_path = os.path.join(view_dir, f"v{batch_id:06d}")
        # deletes stay as tombstones in the stored state (so later
        # replays can't resurrect); readers filter them out
        latest.write.mode("overwrite").parquet(new_path)
        with open(marker + ".tmp", "w", encoding="utf-8") as fh:
            fh.write(new_path)
        os.replace(marker + ".tmp", marker)
        # prune superseded versions (keep the new one + its
        # predecessor for readers mid-scan)
        import shutil

        keep = {new_path, current_path}
        for entry in os.listdir(view_dir):
            full = os.path.join(view_dir, entry)
            if (
                entry.startswith("v")
                and os.path.isdir(full)
                and full not in keep
            ):
                shutil.rmtree(full, ignore_errors=True)

    return sink


def read_materialized_view(spark, view_dir: str):
    """Current view contents (tombstones filtered)."""
    marker = os.path.join(view_dir, "_CURRENT")
    with open(marker, encoding="utf-8") as fh:
        path = fh.read().strip()
    df = spark.read.parquet(path)
    return df.filter(~F.col("__deleted")).drop("__seq", "__deleted")


def memory_rows_sink(store: list) -> Callable[[DataFrame, int], None]:
    """Test sink: append collected rows (list of Row) per batch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        store.append((batch_id, batch_df.collect()))

    return sink
