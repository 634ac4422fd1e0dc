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

Round-trip fidelity (property-tested in tests/test_properties.py):
whitespace is never trimmed, empty string and NULL are kept distinct
via the `\\N` null sentinel, and text containing line terminators
survives when the reader is given ``multiline=True``.  Residuals,
documented: a *literal* ``\\N`` cell reads back as NULL (univocity
compares the sentinel after unquoting — unavoidable in Spark CSV),
and ``multiline`` forfeits intra-file split parallelism, so at scale
keep newline-bearing text in parquet and CSV for interchange only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sample_keyspaces_cdc_streams_connectors_spark.sources.cql_types import cql_schema

#: timestamp layout used by both writers and readers so round-trips
#: are exact to the microsecond (CSV has no native timestamp type).
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

#: null sentinel distinct from the empty string ("" is data, \N is
#: NULL — the PostgreSQL COPY convention)
NULL_SENTINEL = "\\N"


def load_csv(
    spark: SparkSession,
    path: str,
    columns: dict[str, str],
    header: bool = True,
    mode: str = "DROPMALFORMED",
    multiline: bool = False,
) -> DataFrame:
    """Read a CSV directory/file with an explicit CQL-typed schema.

    `columns` is column-name → CQL type, as in the reference's table
    DDL; unparseable rows are dropped (mode=DROPMALFORMED), matching
    the filter layer's error-drops-record rule.  Pass
    ``multiline=True`` only when text cells may contain line
    terminators — it disables intra-file split parallelism.
    """
    return (
        spark.read.schema(cql_schema(columns))
        .option("header", str(header).lower())
        .option("timestampFormat", TS_FMT)
        .option("mode", mode)
        # never trim cell content — whitespace is data
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .option("nullValue", NULL_SENTINEL)
        .option("multiLine", str(multiline).lower())
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
        # the CSV WRITER trims cell whitespace by default — disable so
        # whitespace-bearing text survives the round-trip
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        # NULL → \N, empty string → "" (quoted): the two stay distinct
        .option("nullValue", NULL_SENTINEL)
        .option("emptyValue", '""')
        .csv(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    """JSON-lines writer with the matching timestamp layout."""
    df.write.mode("overwrite").option("timestampFormat", TS_FMT).json(path)
