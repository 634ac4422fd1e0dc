"""CDC-layer correctness queries (SURVEY §2.1 ops #4-#10).

Each query wraps the ``events`` fixture into CDC envelopes with
:func:`envelope.synthesize_cdc` (deterministic CASE rules) and runs one
engine operator; the oracle replicates synthesis + operator in ANSI SQL
over the same parquet, via the shared ``ENVELOPE_SQL_CTE``.
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


# --- #5 cell decode / type cast --------------------------------------------


@register(
    "type_cast",
    oracle="""
    SELECT
      l_orderkey,
      CAST(l_linenumber AS BIGINT) AS lineno_big,
      CAST(l_shipdate AS DATE) AS ship_date,
      CAST(l_extendedprice AS DECIMAL(18,2)) AS price_dec,
      (l_returnflag = 'R') AS is_return,
      CAST(l_orderkey AS VARCHAR) AS okey_str
    FROM lineitem
    """,
)
def type_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL->Spark type mapping (StreamHelpers.java:76-178): int widening,
    date extraction, decimal(p,s), boolean, string casts."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber").cast("bigint").alias("lineno_big"),
        F.to_date("l_shipdate").alias("ship_date"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price_dec"),
        (F.col("l_returnflag") == "R").alias("is_return"),
        F.col("l_orderkey").cast("string").alias("okey_str"),
    )


# --- #6 predicate filter (JEXL semantics) ----------------------------------


@register(
    "filter_operation",
    oracle=_with_env(
        f"""SELECT event_id, seq FROM env
        WHERE {CLASSIFY_SQL_CASE} IN ('INSERT', 'REPLICATED_INSERT')"""
    ),
)
def filter_operation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter on metadata.operation — the README's canonical JEXL example
    (sqs-connector/README.md:386-392 analog)."""
    env = _env(spark, sf_dir)
    return cdc_filter(
        env,
        "metadata.stream_operation_type IN ('INSERT', 'REPLICATED_INSERT')",
    ).select(
        F.col("event_id"),
        F.col("metadata.stream_sequence_number").alias("seq"),
    )


@register(
    "filter_numeric",
    oracle=_with_env(
        """SELECT event_id, value FROM env
        WHERE has_new AND value > 42.5 AND user_id % 7 = 0"""
    ),
)
def filter_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric comparison over newImage cells (JEXL `>` / `&&`)."""
    env = _env(spark, sf_dir)
    return cdc_filter(
        env, "newImage.value > 42.5 AND newImage.user_id % 7 = 0"
    ).select(F.col("event_id"), F.col("newImage.value").alias("value"))


@register(
    "filter_compound",
    oracle=_with_env(
        """SELECT event_id, event_type, value FROM env
        WHERE (event_type = 'click' OR event_type = 'view')
          AND value >= 10 AND NOT (user_id % 2 = 0) AND has_new"""
    ),
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound &&/||/! predicate (JexlFilterService operator set)."""
    env = _env(spark, sf_dir)
    return cdc_filter(
        env,
        "(newImage.event_type = 'click' OR newImage.event_type = 'view')"
        " AND newImage.value >= 10 AND NOT (newImage.user_id % 2 = 0)",
    ).select(
        F.col("event_id"),
        F.col("newImage.event_type").alias("event_type"),
        F.col("newImage.value").alias("value"),
    )


@register(
    "filter_null_safe",
    oracle="""
    SELECT event_id, value FROM events
    WHERE (CASE WHEN value > 50 THEN NULL ELSE value END) > 25
    """,
)
def filter_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JEXL eval-error-drops-record semantics
    (JexlFilterService.java:76-79): a NULL predicate drops the row."""
    ev = load_table(spark, sf_dir, "events")
    return cdc_filter(
        ev, "CASE WHEN value > 50 THEN NULL ELSE value END > 25"
    ).select("event_id", "value")


@register(
    "filter_coerce",
    oracle="""
    SELECT event_id FROM events
    WHERE lower(CASE WHEN value > 90 THEN 'true'
                     WHEN value > 80 THEN 'TRUE'
                     WHEN value > 70 THEN NULL
                     ELSE 'no' END) = 'true'
      AND (CAST(floor(value) AS INTEGER) % 3) <> 0
    """,
)
def filter_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-boolean filter results coerced: string via parseBoolean,
    number via != 0 (JexlFilterService.java:102-124)."""
    ev = load_table(spark, sf_dir, "events")
    step1 = cdc_filter(
        ev,
        "CASE WHEN value > 90 THEN 'true' WHEN value > 80 THEN 'TRUE' "
        "WHEN value > 70 THEN NULL ELSE 'no' END",
    )
    step2 = cdc_filter(step1, "CAST(floor(value) AS INT) % 3")
    return step2.select("event_id")


# --- #7 decimal scalar fns --------------------------------------------------


@register(
    "decimal_compare",
    oracle="""
    SELECT event_id, CAST(value AS DECIMAL(18,6)) AS value_dec
    FROM events
    WHERE CAST(value AS DECIMAL(38,18)) > CAST('49.5' AS DECIMAL(38,18))
    """,
)
def decimal_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """converters:to_big_decimal + compare_to
    (JexlFilterFunctions.java:4-21) as exact DECIMAL comparison."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("value").cast("decimal(38,18)")
        > F.lit("49.5").cast("decimal(38,18)")
    ).select(
        "event_id", F.col("value").cast("decimal(18,6)").alias("value_dec")
    )


# --- #8 column projection ----------------------------------------------------


@register(
    "project_fields",
    oracle=_with_env(
        """SELECT event_id,
                  CASE WHEN has_new THEN user_id END AS user_id,
                  CASE WHEN has_new THEN value END AS value
           FROM env WHERE has_new"""
    ),
)
def project_fields_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fields-to-include whitelist (AbstractJSONConverter.java:256-263)."""
    env = project_fields(_env(spark, sf_dir), ["user_id", "value"])
    return env.filter(F.col("newImage").isNotNull()).select(
        "event_id",
        F.col("newImage.user_id").alias("user_id"),
        F.col("newImage.value").alias("value"),
    )


# --- #9 image / format shaping ----------------------------------------------


@register(
    "image_coalesce",
    oracle=_with_env(
        """SELECT event_id,
                  CASE WHEN has_new THEN user_id WHEN has_old THEN user_id END AS img_user_id,
                  CASE WHEN has_new THEN value WHEN has_old THEN old_value END AS img_value
           FROM env WHERE has_new OR has_old"""
    ),
)
def image_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Default record-format: coalesce(newImage, oldImage)
    (AbstractJSONConverter.java:218-231) — deletes fall back to the old
    image."""
    shaped = shape_output(_env(spark, sf_dir), record_format="default",
                          include_metadata=False)
    return shaped.filter(F.col("user_id").isNotNull()).select(
        "event_id",
        F.col("user_id").alias("img_user_id"),
        F.col("value").alias("img_value"),
    )


@register(
    "full_image_flatten",
    oracle=_with_env(
        """SELECT event_id,
                  CASE WHEN has_new THEN user_id END AS user_id,
                  CASE WHEN has_new THEN value END AS value,
                  CASE WHEN has_old THEN user_id END AS old_user_id,
                  CASE WHEN has_old THEN old_value END AS old_value
           FROM env"""
    ),
)
def full_image_flatten_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """record-format=full Avro flatten: old image under old_ prefix
    (AbstractAvroConverter.java:100-134,380-385)."""
    flat = flatten_full_image(_env(spark, sf_dir))
    return flat.select(
        "event_id", "user_id", "value", "old_user_id", "old_value"
    )


# --- #10 metadata enrichment --------------------------------------------------


@register(
    "metadata_enrich",
    oracle=_with_env(
        f"""SELECT event_id,
                   'media' AS stream_keyspace_name,
                   'events' AS stream_table_name,
                   {CLASSIFY_SQL_CASE} AS stream_operation_type,
                   arrival_ms AS stream_arrival_timestamp,
                   seq AS stream_sequence_number
            FROM env"""
    ),
)
def metadata_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """include-metadata fields (AbstractJSONConverter.java:207-215)."""
    shaped = shape_output(_env(spark, sf_dir), include_metadata=True)
    return shaped.select(
        "event_id",
        "stream_keyspace_name",
        "stream_table_name",
        "stream_operation_type",
        "stream_arrival_timestamp",
        "stream_sequence_number",
    )
