"""CQL -> Spark type mapping (StreamHelpers.java:76-178 semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from sample_keyspaces_cdc_streams_connectors_spark.sources.cql_types import cql_schema, cql_to_spark_type


@pytest.mark.parametrize(
    "cql,expected",
    [
        ("text", T.StringType()),
        ("VARCHAR", T.StringType()),
        ("inet", T.StringType()),
        ("date", T.DateType()),
        ("int", T.IntegerType()),
        ("smallint", T.IntegerType()),  # widened like the reference
        ("tinyint", T.IntegerType()),
        ("bigint", T.LongType()),
        ("counter", T.LongType()),
        ("float", T.FloatType()),
        ("double", T.DoubleType()),
        ("decimal", T.DecimalType(38, 18)),
        ("boolean", T.BooleanType()),
        ("timestamp", T.TimestampType()),
        ("blob", T.BinaryType()),
    ],
)
def test_scalar_mapping(cql, expected):
    assert cql_to_spark_type(cql) == expected


def test_unknown_falls_back_to_text(caplog):
    import logging

    with caplog.at_level(logging.ERROR):
        assert cql_to_spark_type("duration") == T.StringType()
    assert "Unknown CQL type" in caplog.text


@pytest.mark.parametrize(
    "cql,expected",
    [
        ("list<int>", T.ArrayType(T.IntegerType())),
        ("set<text>", T.ArrayType(T.StringType())),
        ("vector<float, 256>", T.ArrayType(T.FloatType())),
        ("map<text, bigint>", T.MapType(T.StringType(), T.LongType())),
        (
            "map<text, list<int>>",
            T.MapType(T.StringType(), T.ArrayType(T.IntegerType())),
        ),
        ("frozen<list<double>>", T.ArrayType(T.DoubleType())),
    ],
)
def test_collections_superset(cql, expected):
    """Collections hit the unknown-type fallback in the reference;
    the engine resolves them natively (SURVEY §1.2 superset claim)."""
    assert cql_to_spark_type(cql) == expected


def test_schema_all_nullable():
    schema = cql_schema({"id": "bigint", "name": "text", "bal": "decimal"})
    assert all(f.nullable for f in schema.fields)
    assert [f.name for f in schema.fields] == ["id", "name", "bal"]
