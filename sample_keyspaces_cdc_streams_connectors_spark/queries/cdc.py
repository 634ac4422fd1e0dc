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
Round 5 (registry 59 > the 50-row driver window — VERDICT r4 #1):
``filter_semantics`` + ``decimal_compare`` folded into
:func:`filter_jexl` as tagged union arms, and ``image_shape`` folded
into :func:`project_enrich` as one narrow pipeline.  Every
consolidated query still exercises the same operator code paths, and
every output column of the retired queries survives in the merged
result (full hash coverage).
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


# --- #6 predicate filter (JEXL semantics) + #7 decimal scalar fns -----------


@register(
    "filter_jexl",
    oracle=_with_env(
        f"""SELECT 'jexl' AS gate, event_id, seq, event_type, value FROM env
        WHERE {CLASSIFY_SQL_CASE} IN ('INSERT', 'REPLICATED_INSERT', 'UPDATE')
          AND (event_type = 'click' OR value > 42.5)
          AND NOT (user_id % 7 = 0)
        UNION ALL
        SELECT 'semantics' AS gate, event_id,
               CAST(NULL AS VARCHAR) AS seq,
               CAST(NULL AS VARCHAR) AS event_type, value
        FROM events
        WHERE (CASE WHEN value > 50 THEN NULL ELSE value END) > 25
          AND lower(CASE WHEN value > 45 THEN 'true'
                         WHEN value > 40 THEN 'TRUE'
                         WHEN value > 35 THEN NULL
                         ELSE 'no' END) = 'true'
          AND (CAST(floor(value) AS INTEGER) % 3) <> 0
        UNION ALL
        SELECT 'decimal' AS gate, event_id,
               CAST(NULL AS VARCHAR) AS seq,
               CAST(NULL AS VARCHAR) AS event_type,
               CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE) AS value
        FROM events
        WHERE CAST(value AS DECIMAL(38,18)) > CAST('49.5' AS DECIMAL(38,18))
        """
    ),
)
def filter_jexl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full JEXL predicate surface as a 3-arm tagged union (r5
    registry consolidation — ``filter_semantics`` + ``decimal_compare``
    folded in; every retired output column survives):

    Arm ``jexl`` — operator set in one compound filter: IN over
    metadata.operation (the README's canonical example,
    sqs-connector/README.md:386-392 analog), numeric comparison and
    modulo over newImage cells, OR / AND / NOT composition
    (JexlFilterService.java:50-130).  The surviving ops all guarantee
    a newImage, so image-field access never nulls out the predicate.

    Arm ``semantics`` — evaluation semantics, chained: (1) a NULL
    predicate result drops the record (eval-error-drops-record,
    JexlFilterService.java:76-79); (2) string results coerce via
    case-insensitive parseBoolean; (3) numeric results coerce via
    != 0 (JexlFilterService.java:102-124).

    Arm ``decimal`` — converters:to_big_decimal + compare_to
    (JexlFilterFunctions.java:4-21) as exact DECIMAL comparison; the
    projection re-casts the decimal to DOUBLE (comparison stays
    decimal-exact, the emitted value is hash-stable)."""
    env = _env(spark, sf_dir)
    jexl = cdc_filter(
        env,
        "metadata.stream_operation_type IN "
        "('INSERT', 'REPLICATED_INSERT', 'UPDATE')"
        " AND (newImage.event_type = 'click' OR newImage.value > 42.5)"
        " AND NOT (newImage.user_id % 7 = 0)",
    ).select(
        F.lit("jexl").alias("gate"),
        F.col("event_id"),
        F.col("metadata.stream_sequence_number").alias("seq"),
        F.col("newImage.event_type").alias("event_type"),
        F.col("newImage.value").alias("value"),
    )

    ev = load_table(spark, sf_dir, "events")
    step1 = cdc_filter(
        ev, "CASE WHEN value > 50 THEN NULL ELSE value END > 25"
    )
    step2 = cdc_filter(
        step1,
        "CASE WHEN value > 45 THEN 'true' WHEN value > 40 THEN 'TRUE' "
        "WHEN value > 35 THEN NULL ELSE 'no' END",
    )
    semantics = cdc_filter(step2, "CAST(floor(value) AS INT) % 3").select(
        F.lit("semantics").alias("gate"),
        "event_id",
        F.lit(None).cast("string").alias("seq"),
        F.lit(None).cast("string").alias("event_type"),
        "value",
    )

    decimal = ev.filter(
        F.col("value").cast("decimal(38,18)")
        > F.lit("49.5").cast("decimal(38,18)")
    ).select(
        F.lit("decimal").alias("gate"),
        "event_id",
        F.lit(None).cast("string").alias("seq"),
        F.lit(None).cast("string").alias("event_type"),
        F.col("value").cast("decimal(18,6)").cast("double").alias("value"),
    )
    return jexl.unionAll(semantics).unionAll(decimal)


# --- #8 + #9 + #10 projection + image shaping + metadata enrichment ---------


@register(
    "project_enrich",
    oracle=_with_env(
        f"""SELECT event_id,
                   CASE WHEN has_new THEN user_id
                        WHEN has_old THEN user_id END AS user_id,
                   CASE WHEN has_new THEN value
                        WHEN has_old THEN old_value END AS value,
                   CASE WHEN has_new THEN user_id END AS new_user_id,
                   CASE WHEN has_new THEN value END AS new_value,
                   CASE WHEN has_old THEN user_id END AS old_user_id,
                   CASE WHEN has_old THEN old_value END AS old_value,
                   'media' AS stream_keyspace_name,
                   'events' AS stream_table_name,
                   {CLASSIFY_SQL_CASE} AS stream_operation_type,
                   arrival_ms AS stream_arrival_timestamp,
                   seq AS stream_sequence_number
            FROM env"""
    ),
)
def project_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + image shaping + metadata enrichment in ONE narrow
    pipeline (r5 registry consolidation — ``image_shape`` folded in;
    every retired output column survives, renamed ``new_*`` where the
    two queries used the same name for different semantics):

    - fields-to-include whitelist (AbstractJSONConverter.java:256-263):
      user_id/value only — event_type/props dropped;
    - default record-format image coalesce(newImage, oldImage)
      (AbstractJSONConverter.java:218-231) → ``user_id``/``value``
      (deletes fall back to the old image);
    - record-format=full flatten, old image under old_ prefix
      (AbstractAvroConverter.java:100-134,380-385) →
      ``new_user_id``/``new_value``/``old_user_id``/``old_value``;
    - include-metadata enrichment (AbstractJSONConverter.java:207-215)
      → the stream_* columns.

    Single map-only stage over the envelope — no self-join to glue the
    two shapes together (they are column-level transforms of the same
    row, so the 100 TB plan is one projection)."""
    env = project_fields(_env(spark, sf_dir), ["user_id", "value"])
    with_img = env.withColumn("__img", coalesce_image(env))
    shaped = shape_output(
        with_img, record_format="full", include_metadata=True
    )
    return shaped.select(
        "event_id",
        F.col("__img.user_id").alias("user_id"),
        F.col("__img.value").alias("value"),
        F.col("user_id").alias("new_user_id"),
        F.col("value").alias("new_value"),
        "old_user_id",
        "old_value",
        "stream_keyspace_name",
        "stream_table_name",
        "stream_operation_type",
        "stream_arrival_timestamp",
        "stream_sequence_number",
    )
