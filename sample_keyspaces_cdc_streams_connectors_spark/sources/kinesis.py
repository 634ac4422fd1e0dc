"""Kinesis-compatible streaming source for the CDC pipeline (prod path).

Reference wiring (KCLScheduler.java:101-168): the scheduler reads a
Keyspaces CDC stream through the Kinesis adapter client with a
single-stream tracker pinned at ``TRIM_HORIZON`` (:162-168), after
resolving the stream ARN from config (KeyspacesConfig.java:180-215 —
explicit ARN takes precedence, else ``ListStreams`` filtered by
keyspace/table and, when set, the stream label).

Spark mapping: Keyspaces CDC streams speak the Kinesis data-plane
protocol, so the production source is ``spark.readStream.format(
"aws-kinesis")`` via the open-source Spark Structured Streaming
Kinesis connector (``spark-streaming-sql-kinesis-connector``), whose
output schema is the standard Kinesis record envelope::

    data binary, streamName string, partitionKey string,
    sequenceNumber string, approximateArrivalTimestamp timestamp

This module keeps the interface compile-checked in the sandbox (no
connector jar, no AWS endpoint):

- :func:`resolve_stream_arn` reproduces the reference's discovery
  precedence with an injectable ``list_streams`` callable, so the
  ARN/label logic is unit-testable without AWS.
- :func:`kinesis_source_options` assembles the connector options the
  reference's scheduler config maps onto.
- :func:`parse_wire_records` is the real deserialization path — pure
  Column expressions (``from_json`` over the binary payload) turning
  raw Kinesis records into the engine's envelope schema; it works
  identically on batch and streaming DataFrames and is tested on
  batch ones.
- :func:`read_stream` attempts the real connector load and raises
  :class:`KinesisConnectorUnavailable` with the spark-submit
  coordinates when the DataSource is not registered, so the source
  swap is an option change, never a transform change.

At 100 TB the source parallelism is one Spark input partition per
shard; everything downstream of :func:`parse_wire_records` is the
same codegen'd column program as the file/test source — swapping
sources never touches the transform stack.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Iterable, Mapping
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

logger = logging.getLogger(__name__)

#: Maven coordinates of the open-source connector for the error hint.
CONNECTOR_PACKAGE = (
    "software.amazon.awssdk:spark-streaming-sql-kinesis-connector_2.12:1.0.0"
)


class KinesisConnectorUnavailable(RuntimeError):
    """The ``aws-kinesis`` DataSource is not on the classpath."""


@dataclass(frozen=True)
class KinesisSourceConfig:
    """Engine analog of the reference's stream block
    (KeyspacesConfig.java:180-215 + KCLScheduler.java:162-168)."""

    keyspace: str
    table: str
    region: str
    stream_arn: str | None = None  # explicit ARN wins (ref :182-184)
    stream_label: str | None = None  # 'stream-name' label filter (ref :197-202)
    initial_position: str = "TRIM_HORIZON"  # ref pins TRIM_HORIZON (:165-166)
    endpoint_url: str | None = None  # test/localstack override
    connector_format: str = "aws-kinesis"


def resolve_stream_arn(
    config: KinesisSourceConfig,
    list_streams: Callable[[str, str], Iterable[Mapping[str, str]]],
) -> str | None:
    """Discovery precedence of ``KeyspacesConfig.getStreamArn``
    (KeyspacesConfig.java:180-215).

    ``list_streams(keyspace, table)`` yields mappings with keys
    ``keyspace_name``, ``table_name``, ``stream_label``,
    ``stream_arn`` (the ``ListStreams`` response shape).

    Thin adapter over :func:`sample_keyspaces_cdc_streams_connectors_spark.runtime.
    get_stream_arn` — the single implementation of the reference's
    selection semantics (case-insensitive match, label filter only
    when configured, first match wins, errors -> None).  This wrapper
    only converts the ``ListStreams`` mapping shape into
    :class:`~sample_keyspaces_cdc_streams_connectors_spark.runtime.StreamDescriptor`.
    """
    from sample_keyspaces_cdc_streams_connectors_spark.runtime import StreamDescriptor, get_stream_arn

    def _descriptors() -> Iterable[StreamDescriptor]:
        for stream in list_streams(config.keyspace, config.table):
            yield StreamDescriptor(
                stream_arn=stream["stream_arn"],
                keyspace_name=stream["keyspace_name"],
                table_name=stream["table_name"],
                stream_label=stream.get("stream_label", ""),
            )

    return get_stream_arn(
        config.keyspace,
        config.table,
        stream_label=config.stream_label,
        configured_arn=config.stream_arn,
        list_streams=_descriptors,
    )


def kinesis_source_options(
    config: KinesisSourceConfig, stream_arn: str
) -> dict[str, str]:
    """Connector options for the resolved stream."""
    options = {
        "streamName": stream_arn,
        "region": config.region,
        "startingposition": config.initial_position,
    }
    if config.endpoint_url:
        options["endpointUrl"] = config.endpoint_url
    return options


def wire_record_schema(image_schema: T.StructType) -> T.StructType:
    """Schema of one Keyspaces stream record as JSON on the wire.

    Models the Keyspaces streams ``GetRecords`` record shape the KCL
    adapter hands to ``processRecords`` (KeyspacesRecordProcessor.
    java:41-60): event metadata (``origin``, ``createdAt``,
    ``sequenceNumber`` — StreamHelpers.java:26-41) plus the decoded
    ``newImage``/``oldImage`` row snapshots, already cell-decoded to
    the table's typed columns (StreamHelpers.java:76-117 — our cell
    decode happens schema-side via :mod:`.cql_types`).
    """
    return T.StructType(
        [
            T.StructField("eventVersion", T.StringType()),
            T.StructField("createdAt", T.TimestampType()),
            T.StructField("origin", T.StringType()),
            T.StructField("sequenceNumber", T.StringType()),
            T.StructField("newImage", image_schema),
            T.StructField("oldImage", image_schema),
        ]
    )


def parse_wire_records(
    raw: DataFrame,
    image_schema: T.StructType,
    keyspace: str,
    table: str,
) -> DataFrame:
    """Kinesis record envelope -> engine CDC envelope.

    Input columns (connector output): ``data`` binary JSON payload,
    ``sequenceNumber`` string, ``approximateArrivalTimestamp``
    timestamp.  Output: the envelope of :mod:`..envelope` — metadata
    struct + nullable ``newImage``/``oldImage`` — with keyspace/table
    injected from config exactly like AbstractJSONConverter.java:
    207-215.  Pure Column expressions (``from_json``), so the parse
    runs inside codegen on batch and streaming DataFrames alike.
    """
    rec = F.from_json(F.col("data").cast("string"), wire_record_schema(image_schema))
    meta = F.struct(
        F.lit(keyspace).alias("stream_keyspace_name"),
        F.lit(table).alias("stream_table_name"),
        F.lit(None).cast("string").alias("stream_operation_type"),
        F.unix_millis(F.col("approximateArrivalTimestamp")).alias(
            "stream_arrival_timestamp"
        ),
        # shard sequence number travels on the Kinesis record itself;
        # fall back to the payload's own number when absent
        F.coalesce(F.col("sequenceNumber"), rec["sequenceNumber"]).alias(
            "stream_sequence_number"
        ),
        rec["origin"].alias("origin"),
    )
    return raw.select(
        meta.alias("metadata"),
        rec["newImage"].alias("newImage"),
        rec["oldImage"].alias("oldImage"),
    )


def read_stream(
    spark: SparkSession,
    config: KinesisSourceConfig,
    stream_arn: str | None = None,
    list_streams: Callable[[str, str], Iterable[Mapping[str, str]]] | None = None,
) -> DataFrame:
    """Open the production Kinesis stream (raw, pre-parse).

    Raises :class:`KinesisConnectorUnavailable` with install
    coordinates when the connector is absent (this sandbox), and
    ``ValueError`` when no stream ARN can be resolved — the two
    failure modes are distinguishable so deployment errors are
    actionable.
    """
    if stream_arn is None:
        if list_streams is None:
            raise ValueError(
                "no stream_arn configured and no list_streams callable "
                "provided for discovery"
            )
        stream_arn = resolve_stream_arn(config, list_streams)
    if not stream_arn:
        raise ValueError(
            f"no CDC stream found for {config.keyspace}.{config.table}"
            + (f" label={config.stream_label}" if config.stream_label else "")
        )
    reader = spark.readStream.format(config.connector_format)
    for k, v in kinesis_source_options(config, stream_arn).items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:
        raise KinesisConnectorUnavailable(
            f"DataSource '{config.connector_format}' is not registered in "
            f"this Spark build; submit with --packages {CONNECTOR_PACKAGE} "
            "(or bundle the connector jar) to read Keyspaces CDC streams "
            "in production"
        ) from exc
