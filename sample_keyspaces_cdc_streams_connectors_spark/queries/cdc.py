"""CDC-layer correctness queries (SURVEY §2.1 ops #4-#10).

Each query wraps the ``events`` fixture into CDC envelopes with
:func:`envelope.synthesize_cdc` (deterministic CASE rules) and runs one
engine operator; the oracle replicates synthesis + operator in ANSI SQL
over the same parquet, via the shared ``ENVELOPE_SQL_CTE``.

Registry budget note (round 2): the driver oracle-checks at most 50
registered queries, so the r1 fine-grained variants are consolidated —
``filter_operation/numeric/compound`` → :func:`filter_jexl`,
``filter_null_safe/coerce`` → :func:`filter_semantics`,
``project_fields`` + ``metadata_enrich`` → :func:`project_enrich`,
``image_coalesce`` + ``full_image_flatten`` → :func:`image_shape`, and
``type_cast`` merged with ``scan_project`` (queries/relational.py).
Every consolidated query still exercises the same operator code paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.envelope import (
    CLASSIFY_SQL_CASE,
    ENVELOPE_SQL_CTE,
    synthesize_cdc,
)
from sample_keyspaces_cdc_streams_connectors_spark.operators import (
    cdc_filter,
    classify_operation,
    coalesce_image,
    flatten_full_image,
    project_fields,
    shape_output,
)
from sample_keyspaces_cdc_streams_connectors_spark.queries import register
from sample_keyspaces_cdc_streams_connectors_spark.sources import load_table


def _env(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classify_operation(
        synthesize_cdc(load_table(spark, sf_dir, "events"))
    )


def _with_env(select_sql: str) -> str:
    return f"WITH env AS ({ENVELOPE_SQL_CTE}) {select_sql}"


# --- #4 operation classification ------------------------------------------


@register(
    "op_classify",
    oracle=_with_env(
        f"SELECT {CLASSIFY_SQL_CASE} AS op, COUNT(*) AS n FROM env GROUP BY op"
    ),
)
def op_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StreamHelpers.getOperationType truth table (StreamHelpers.java:26-63)
    as a codegen'd CASE column, aggregated by op."""
    return _env(spark, sf_dir).groupBy(
        F.col("metadata.stream_operation_type").alias("op")
    ).agg(F.count("*").alias("n"))


# --- #6 predicate filter (JEXL semantics) ----------------------------------


@register(
    "filter_jexl",
    oracle=_with_env(
        f"""SELECT event_id, seq, event_type, value FROM env
        WHERE {CLASSIFY_SQL_CASE} IN ('INSERT', 'REPLICATED_INSERT', 'UPDATE')
          AND (event_type = 'click' OR value > 42.5)
          AND NOT (user_id % 7 = 0)"""
    ),
)
def filter_jexl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JEXL predicate operator set in one compound filter: IN over
    metadata.operation (the README's canonical example,
    sqs-connector/README.md:386-392 analog), numeric comparison and
    modulo over newImage cells, OR / AND / NOT composition
    (JexlFilterService.java:50-130).

    The surviving ops all guarantee a newImage, so image-field access
    never nulls out the predicate here (null semantics are covered by
    filter_semantics)."""
    env = _env(spark, sf_dir)
    return cdc_filter(
        env,
        "metadata.stream_operation_type IN "
        "('INSERT', 'REPLICATED_INSERT', 'UPDATE')"
        " AND (newImage.event_type = 'click' OR newImage.value > 42.5)"
        " AND NOT (newImage.user_id % 7 = 0)",
    ).select(
        F.col("event_id"),
        F.col("metadata.stream_sequence_number").alias("seq"),
        F.col("newImage.event_type").alias("event_type"),
        F.col("newImage.value").alias("value"),
    )


@register(
    "filter_semantics",
    oracle="""
    SELECT event_id, value FROM events
    WHERE (CASE WHEN value > 50 THEN NULL ELSE value END) > 25
      AND lower(CASE WHEN value > 45 THEN 'true'
                     WHEN value > 40 THEN 'TRUE'
                     WHEN value > 35 THEN NULL
                     ELSE 'no' END) = 'true'
      AND (CAST(floor(value) AS INTEGER) % 3) <> 0
    """,
)
def filter_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JEXL evaluation semantics, chained: (1) a NULL predicate result
    drops the record (eval-error-drops-record,
    JexlFilterService.java:76-79); (2) string results coerce via
    case-insensitive parseBoolean; (3) numeric results coerce via
    != 0 (JexlFilterService.java:102-124)."""
    ev = load_table(spark, sf_dir, "events")
    step1 = cdc_filter(
        ev, "CASE WHEN value > 50 THEN NULL ELSE value END > 25"
    )
    step2 = cdc_filter(
        step1,
        "CASE WHEN value > 45 THEN 'true' WHEN value > 40 THEN 'TRUE' "
        "WHEN value > 35 THEN NULL ELSE 'no' END",
    )
    step3 = cdc_filter(step2, "CAST(floor(value) AS INT) % 3")
    return step3.select("event_id", "value")


# --- #7 decimal scalar fns --------------------------------------------------


@register(
    "decimal_compare",
    oracle="""
    SELECT event_id,
           CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE) AS value_dec
    FROM events
    WHERE CAST(value AS DECIMAL(38,18)) > CAST('49.5' AS DECIMAL(38,18))
    """,
)
def decimal_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """converters:to_big_decimal + compare_to
    (JexlFilterFunctions.java:4-21) as exact DECIMAL comparison; the
    final projection re-casts the decimal to DOUBLE (comparison stays
    decimal-exact, the emitted value is hash-stable)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("value").cast("decimal(38,18)")
        > F.lit("49.5").cast("decimal(38,18)")
    ).select(
        "event_id",
        F.col("value").cast("decimal(18,6)").cast("double").alias("value_dec"),
    )


# --- #8 + #10 projection whitelist + metadata enrichment --------------------


@register(
    "project_enrich",
    oracle=_with_env(
        f"""SELECT event_id,
                   CASE WHEN has_new THEN user_id
                        WHEN has_old THEN user_id END AS user_id,
                   CASE WHEN has_new THEN value
                        WHEN has_old THEN old_value END AS value,
                   'media' AS stream_keyspace_name,
                   'events' AS stream_table_name,
                   {CLASSIFY_SQL_CASE} AS stream_operation_type,
                   arrival_ms AS stream_arrival_timestamp,
                   seq AS stream_sequence_number
            FROM env"""
    ),
)
def project_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fields-to-include whitelist (AbstractJSONConverter.java:256-263)
    composed with include-metadata enrichment
    (AbstractJSONConverter.java:207-215): the projected coalesced image
    (user_id, value only — event_type/props dropped by the whitelist)
    plus the stream_* metadata columns."""
    shaped = shape_output(
        project_fields(_env(spark, sf_dir), ["user_id", "value"]),
        record_format="default",
        include_metadata=True,
    )
    return shaped.select(
        "event_id",
        "user_id",
        "value",
        "stream_keyspace_name",
        "stream_table_name",
        "stream_operation_type",
        "stream_arrival_timestamp",
        "stream_sequence_number",
    )


# --- #9 image / format shaping ----------------------------------------------


@register(
    "image_shape",
    oracle=_with_env(
        """SELECT event_id,
                  CASE WHEN has_new THEN user_id END AS user_id,
                  CASE WHEN has_new THEN value END AS value,
                  CASE WHEN has_old THEN user_id END AS old_user_id,
                  CASE WHEN has_old THEN old_value END AS old_value,
                  CASE WHEN has_new THEN user_id
                       WHEN has_old THEN user_id END AS img_user_id,
                  CASE WHEN has_new THEN value
                       WHEN has_old THEN old_value END AS img_value
           FROM env"""
    ),
)
def image_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both record formats in one query: record-format=full flatten
    (old image under old_ prefix, AbstractAvroConverter.java:100-134,
    380-385) alongside the default coalesce(newImage, oldImage) image
    (AbstractJSONConverter.java:218-231) — deletes fall back to the
    old image."""
    env = _env(spark, sf_dir)
    flat = flatten_full_image(env.withColumn("__img", coalesce_image(env)))
    return flat.select(
        "event_id",
        "user_id",
        "value",
        "old_user_id",
        "old_value",
        F.col("__img.user_id").alias("img_user_id"),
        F.col("__img.value").alias("img_value"),
    )
