"""Kinesis production-source interface: discovery, options, wire parse.

The connector jar is absent in this sandbox, so ``read_stream`` is
tested for its actionable-failure contract; the deserialization path
(``parse_wire_records``) is pure Column expressions and is exercised
for real on batch DataFrames, feeding the same classify stack the
file source uses.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sample_keyspaces_cdc_streams_connectors_spark.operators import classify_operation
from sample_keyspaces_cdc_streams_connectors_spark.sources.kinesis import (
    CONNECTOR_PACKAGE,
    KinesisConnectorUnavailable,
    KinesisSourceConfig,
    kinesis_source_options,
    parse_wire_records,
    read_stream,
    resolve_stream_arn,
)

CFG = KinesisSourceConfig(keyspace="media", table="movies", region="us-east-1")

STREAMS = [
    {
        "keyspace_name": "MEDIA",
        "table_name": "Movies",
        "stream_label": "2026-01-01T00:00:00.000",
        "stream_arn": "arn:aws:cassandra:us-east-1:1:stream/media/movies/a",
    },
    {
        "keyspace_name": "media",
        "table_name": "movies",
        "stream_label": "2026-02-02T00:00:00.000",
        "stream_arn": "arn:aws:cassandra:us-east-1:1:stream/media/movies/b",
    },
    {
        "keyspace_name": "media",
        "table_name": "other",
        "stream_label": "2026-01-01T00:00:00.000",
        "stream_arn": "arn:aws:cassandra:us-east-1:1:stream/media/other/c",
    },
]


class TestResolveStreamArn:
    def test_explicit_arn_wins(self):
        cfg = KinesisSourceConfig(
            keyspace="media", table="movies", region="us-east-1",
            stream_arn="arn:explicit",
        )

        def boom(ks, tbl):  # discovery must not even be attempted
            raise AssertionError("list_streams called despite explicit ARN")

        assert resolve_stream_arn(cfg, boom) == "arn:explicit"

    def test_first_table_match_case_insensitive(self):
        # KeyspacesConfig.java:203-205: first keyspace/table match wins
        # (equalsIgnoreCase), label ignored when not configured
        assert resolve_stream_arn(CFG, lambda ks, tbl: STREAMS) == (
            "arn:aws:cassandra:us-east-1:1:stream/media/movies/a"
        )

    def test_label_filter(self):
        cfg = KinesisSourceConfig(
            keyspace="media", table="movies", region="us-east-1",
            stream_label="2026-02-02T00:00:00.000",
        )
        assert resolve_stream_arn(cfg, lambda ks, tbl: STREAMS) == (
            "arn:aws:cassandra:us-east-1:1:stream/media/movies/b"
        )

    def test_no_match_returns_none(self):
        cfg = KinesisSourceConfig(
            keyspace="media", table="absent", region="us-east-1"
        )
        assert resolve_stream_arn(cfg, lambda ks, tbl: STREAMS) is None

    def test_discovery_error_swallowed(self):
        # KeyspacesConfig.java:209-213: errors are logged, null returned
        def boom(ks, tbl):
            raise RuntimeError("ListStreams failed")

        assert resolve_stream_arn(CFG, boom) is None


def test_source_options():
    opts = kinesis_source_options(CFG, "arn:x")
    assert opts == {
        "streamName": "arn:x",
        "region": "us-east-1",
        "startingposition": "TRIM_HORIZON",  # KCLScheduler.java:165-166
    }
    with_ep = kinesis_source_options(
        KinesisSourceConfig(
            keyspace="k", table="t", region="r", endpoint_url="http://local:4566"
        ),
        "arn:x",
    )
    assert with_ep["endpointUrl"] == "http://local:4566"


IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("vote_count", T.IntegerType()),
    ]
)


def _raw_df(spark, payloads):
    rows = [
        (
            json.dumps(p).encode("utf-8"),
            f"seq-{i:04d}",
            __import__("datetime").datetime(2026, 1, 1, 0, 0, i),
        )
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("data", T.BinaryType()),
                T.StructField("sequenceNumber", T.StringType()),
                T.StructField("approximateArrivalTimestamp", T.TimestampType()),
            ]
        ),
    )


class TestParseWireRecords:
    def test_envelope_shape_and_classification(self, spark):
        raw = _raw_df(
            spark,
            [
                {  # INSERT: new only, USER origin
                    "origin": "USER",
                    "sequenceNumber": "payload-0",
                    "newImage": {"title": "Heat", "vote_count": 100},
                },
                {  # REPLICATED_DELETE: old only
                    "origin": "REPLICATION",
                    "oldImage": {"title": "Ran", "vote_count": 7},
                },
                {"origin": "TTL", "oldImage": {"title": "Solaris"}},
            ],
        )
        env = parse_wire_records(raw, IMAGE_SCHEMA, "media", "movies")
        out = classify_operation(env).select(
            "metadata.stream_keyspace_name",
            "metadata.stream_table_name",
            "metadata.stream_operation_type",
            "metadata.stream_sequence_number",
            "metadata.stream_arrival_timestamp",
            "newImage.title",
        ).collect()
        assert [r.stream_operation_type for r in out] == [
            "INSERT",
            "REPLICATED_DELETE",
            "TTL",
        ]
        assert all(r.stream_keyspace_name == "media" for r in out)
        assert all(r.stream_table_name == "movies" for r in out)
        # Kinesis-record sequence number wins over the payload's own
        assert out[0].stream_sequence_number == "seq-0000"
        # arrival timestamp -> epoch millis (UTC session)
        assert out[1].stream_arrival_timestamp == 1767225601000
        assert out[0].title == "Heat"

    def test_missing_images_are_null_structs(self, spark):
        raw = _raw_df(spark, [{"origin": "USER"}])
        row = parse_wire_records(raw, IMAGE_SCHEMA, "k", "t").first()
        assert row.newImage is None and row.oldImage is None

    def test_envelope_schema_matches_file_source(self, spark, sf_dir):
        """The Kinesis parse and the test file source must emit the
        SAME metadata schema, so the transform stack is source-agnostic."""
        from sample_keyspaces_cdc_streams_connectors_spark.envelope import synthesize_cdc
        from sample_keyspaces_cdc_streams_connectors_spark.sources import load_table

        file_env = synthesize_cdc(load_table(spark, sf_dir, "events"))
        kin_env = parse_wire_records(
            _raw_df(spark, [{"origin": "USER"}]), IMAGE_SCHEMA, "k", "t"
        )
        file_meta = file_env.schema["metadata"].dataType
        kin_meta = kin_env.schema["metadata"].dataType
        assert [f.name for f in file_meta.fields] == [
            f.name for f in kin_meta.fields
        ]
        assert [f.dataType for f in file_meta.fields] == [
            f.dataType for f in kin_meta.fields
        ]


def test_read_stream_failure_contract(spark):
    # no ARN and no discovery hook -> ValueError (config error)
    with pytest.raises(ValueError, match="no stream_arn"):
        read_stream(spark, CFG)
    # discovery finds nothing -> ValueError naming the table
    with pytest.raises(ValueError, match="media.movies"):
        read_stream(spark, CFG, list_streams=lambda ks, tbl: [])
    # connector absent in this sandbox -> actionable error w/ coordinates
    with pytest.raises(KinesisConnectorUnavailable, match="--packages"):
        read_stream(spark, CFG, stream_arn="arn:x")
    assert "kinesis" in CONNECTOR_PACKAGE
