"""Typed file sources: CSV / JSON lines with CQL-derived schemas.

The reference ingests CSV with a hand-rolled per-row loader
(`s3-vector-connector/example/data_loader.py:243-262`: csv.DictReader
→ typed INSERT per row, throttled to 1 row/s).  The engine's analog
is a declarative `spark.read.csv/json` scan with the schema derived
from the same CQL column declarations the loader's target table uses
(`data_loader.py:156-170`) — so the typed-decode contract
(StreamHelpers.java:129-178) holds for file sources exactly as for
the CDC stream, and Catalyst still gets column pruning + predicate
pushdown into the scan.

Scale: schema is explicit (never inferSchema — at 100 TB an inference
pass is a full extra scan); malformed rows follow the reference's
drop-don't-fail filter semantics (JexlFilterService.java:76-79) via
DROPMALFORMED.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sample_keyspaces_cdc_streams_connectors_spark.sources.cql_types import cql_schema

#: timestamp layout used by both writers and readers so round-trips
#: are exact to the microsecond (CSV has no native timestamp type).
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def load_csv(
    spark: SparkSession,
    path: str,
    columns: dict[str, str],
    header: bool = True,
    mode: str = "DROPMALFORMED",
) -> DataFrame:
    """Read a CSV directory/file with an explicit CQL-typed schema.

    `columns` is column-name → CQL type, as in the reference's table
    DDL; unparseable rows are dropped (mode=DROPMALFORMED), matching
    the filter layer's error-drops-record rule.
    """
    return (
        spark.read.schema(cql_schema(columns))
        .option("header", str(header).lower())
        .option("timestampFormat", TS_FMT)
        .option("mode", mode)
        .csv(path)
    )


def load_json(
    spark: SparkSession,
    path: str,
    columns: dict[str, str],
    mode: str = "DROPMALFORMED",
) -> DataFrame:
    """Read JSON-lines with an explicit CQL-typed schema (the shape the
    JSON sink emits — AbstractJSONConverter.java:93-183)."""
    return (
        spark.read.schema(cql_schema(columns))
        .option("timestampFormat", TS_FMT)
        .option("mode", mode)
        .json(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV writer with the matching timestamp layout (round-trip
    counterpart of :func:`load_csv`)."""
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("timestampFormat", TS_FMT)
        .csv(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    """JSON-lines writer with the matching timestamp layout."""
    df.write.mode("overwrite").option("timestampFormat", TS_FMT).json(path)
