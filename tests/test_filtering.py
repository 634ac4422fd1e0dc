"""JEXL-semantics predicate filter (JexlFilterService.java:50-130):
eval error / null -> record dropped; string results coerced via
parseBoolean; numeric results coerced via != 0."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.operators import cdc_filter


def _docs(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 0.0), (3, "TRUE", None), (4, "false", 2.5)],
        "id int, s string, x double",
    )


def test_none_predicate_is_identity(spark):
    df = _docs(spark)
    assert cdc_filter(df, None).count() == df.count()
    assert cdc_filter(df, "").count() == df.count()


def test_null_comparison_drops_row(spark):
    # JEXL eval error on missing field drops the record
    # (JexlFilterService.java:76-79); Spark: NULL predicate -> drop.
    out = cdc_filter(_docs(spark), "x > 1.0")
    # id 3 has x=NULL -> NULL predicate -> dropped, not an error
    assert {r.id for r in out.collect()} == {1, 4}


def test_string_result_parse_boolean(spark):
    # Boolean.parseBoolean: case-insensitive "true" only.
    out = cdc_filter(_docs(spark), "s")
    assert {r.id for r in out.collect()} == {3}


def test_numeric_result_nonzero(spark):
    out = cdc_filter(_docs(spark), "x")
    assert {r.id for r in out.collect()} == {1, 4}


def test_compound_and_null_safe(spark):
    out = cdc_filter(_docs(spark), "coalesce(x, 0.0) > 1.0 AND id < 4")
    assert {r.id for r in out.collect()} == {1}


def test_unresolvable_field_drops_all(spark):
    """JEXL parity: a predicate over a missing field drops every
    record (per-record eval error -> drop, JexlFilterService:76-79),
    it does not fail the pipeline."""
    df = _docs(spark)
    out = cdc_filter(df, "no_such_column > 5")
    assert out.count() == 0
    assert out.columns == df.columns  # schema preserved


def test_envelope_filter_on_metadata(envelopes):
    out = cdc_filter(
        envelopes, "metadata.stream_operation_type = 'INSERT'"
    ).select(F.col("metadata.stream_operation_type").alias("op"))
    ops = {r.op for r in out.distinct().collect()}
    assert ops == {"INSERT"}
