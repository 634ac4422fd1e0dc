"""The CDC record envelope — the engine's core data model.

The reference's unit of data is a ``KeyspacesStreamsClientRecord``:
new/old row images (maps of column -> typed cell,
``JexlFilterService.java:138-151``, ``AbstractJSONConverter.java:243-267``)
plus stream metadata (sequence number, arrival timestamp, origin,
keyspace/table injected from config —
``AbstractJSONConverter.java:207-215``, ``StreamHelpers.java:26-41``).

Spark mapping: ONE fixed envelope schema —

.. code-block::

    metadata: struct<stream_keyspace_name string,
                     stream_table_name string,
                     stream_operation_type string,
                     stream_arrival_timestamp bigint,   -- epoch millis
                     stream_sequence_number string,
                     origin string>                     -- USER|REPLICATION|TTL
    newImage: struct<...table columns...>   -- null for DELETE/TTL
    oldImage: struct<...table columns...>   -- null for INSERT

Everything is Column expressions: nullable struct columns instead of
per-record Java maps, so the envelope stays inside whole-stage codegen
and scales columnar via Tungsten.

``synthesize_cdc`` deterministically wraps the ``events`` fixture
table into envelopes covering the full operation truth table
(StreamHelpers.java:26-63) — the batch-test analog of the Keyspaces
stream source.  The synthesis rules are simple CASE expressions so a
SQL oracle can replicate them exactly (see ``oracle_fragments``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

METADATA_FIELDS = (
    "stream_keyspace_name",
    "stream_table_name",
    "stream_operation_type",
    "stream_arrival_timestamp",
    "stream_sequence_number",
    "origin",
)

#: columns of the synthesized row image for the ``events`` table
EVENT_IMAGE_FIELDS = ("user_id", "event_type", "value", "props")


def _origin_expr() -> Column:
    """Synthesis rule: origin as a function of (event_type, value).

    Disjoint by event_type, so clause order is irrelevant — the SQL
    oracle uses the same clauses.
    """
    t, v = F.col("event_type"), F.col("value")
    return (
        F.when((t == "error") & (v < 50), F.lit("TTL"))
        .when((t == "view") | ((t == "purchase") & (v < 50)), F.lit("REPLICATION"))
        .when((t == "click") & (v < 5), F.lit(None).cast("string"))
        .otherwise(F.lit("USER"))
    )


def _has_new_expr() -> Column:
    t, v = F.col("event_type"), F.col("value")
    return t.isin("signup", "click", "purchase") | ((t == "view") & (v >= 10))


def _has_old_expr() -> Column:
    return F.col("event_type").isin("click", "view", "error")


def synthesize_cdc(
    events: DataFrame,
    keyspace: str = "media",
    table: str = "events",
) -> DataFrame:
    """events rows -> CDC envelopes (deterministic, oracle-replicable).

    Op coverage: signup / purchase>=50 -> INSERT; purchase<50 ->
    REPLICATED_INSERT; click>=5 -> UPDATE; view>=10 ->
    REPLICATED_UPDATE; error>=50 -> DELETE; view<10 ->
    REPLICATED_DELETE; error<50 -> TTL; click<5 -> UNKNOWN (null
    origin).  The old image perturbs ``value`` by -1.0 so old/new are
    distinguishable downstream (old_ flatten tests).
    """
    # r14 optimization: the envelope projection is composed as SQL
    # text — the Column-tree form cost ~0.2 s of py4j round trips per
    # construction, paid by every CDC query AND every timed CDC
    # throughput pass.  Identical expressions (oracle-verified by all
    # envelope gates; Column/SQL equivalence additionally pinned in
    # tests/test_classify.py).
    ks = keyspace.replace("'", "''")
    tb = table.replace("'", "''")
    origin_sql = (
        "CASE WHEN (event_type = 'error') AND (value < 50) THEN 'TTL' "
        "WHEN (event_type = 'view') OR ((event_type = 'purchase') "
        "AND (value < 50)) THEN 'REPLICATION' "
        "WHEN (event_type = 'click') AND (value < 5) "
        "THEN CAST(NULL AS STRING) "
        "ELSE 'USER' END"
    )
    has_new_sql = (
        "(event_type IN ('signup', 'click', 'purchase') "
        "OR ((event_type = 'view') AND (value >= 10)))"
    )
    has_old_sql = "event_type IN ('click', 'view', 'error')"
    return events.selectExpr(
        "event_id",
        f"struct('{ks}' AS stream_keyspace_name, "
        f"'{tb}' AS stream_table_name, "
        "CAST(NULL AS STRING) AS stream_operation_type, "
        "unix_millis(ts) AS stream_arrival_timestamp, "
        "lpad(CAST(event_id AS STRING), 12, '0') "
        "AS stream_sequence_number, "
        f"{origin_sql} AS origin) AS metadata",
        f"CASE WHEN {has_new_sql} THEN "
        "struct(user_id, event_type, value, props) END AS newImage",
        f"CASE WHEN {has_old_sql} THEN "
        "struct(user_id, event_type, value - CAST(1.0 AS DOUBLE) AS value, "
        "props) END AS oldImage",
    )


# --- SQL oracle fragments (ANSI, DuckDB-runnable) -------------------------

#: CTE body producing the same flat envelope from the `events` view.
#: Columns: event_id, origin, has_new, has_old, arrival_ms, seq,
#: user_id, event_type, value, props, old_value.
ENVELOPE_SQL_CTE = """
SELECT
  event_id,
  CASE
    WHEN event_type = 'error' AND value < 50 THEN 'TTL'
    WHEN event_type = 'view' OR (event_type = 'purchase' AND value < 50)
      THEN 'REPLICATION'
    WHEN event_type = 'click' AND value < 5 THEN NULL
    ELSE 'USER'
  END AS origin,
  (event_type IN ('signup', 'click', 'purchase')
     OR (event_type = 'view' AND value >= 10)) AS has_new,
  (event_type IN ('click', 'view', 'error')) AS has_old,
  epoch_ms(ts) AS arrival_ms,
  lpad(CAST(event_id AS VARCHAR), 12, '0') AS seq,
  user_id, event_type, value, props,
  value - 1.0 AS old_value
FROM events
"""

#: CASE expression classifying the op from (origin, has_new, has_old) —
#: mirror of StreamHelpers.getOperationType (StreamHelpers.java:26-63).
CLASSIFY_SQL_CASE = """
CASE
  WHEN origin IS NULL THEN 'UNKNOWN'
  WHEN origin = 'TTL' THEN 'TTL'
  WHEN has_old AND NOT has_new THEN
    CASE WHEN origin = 'REPLICATION' THEN 'REPLICATED_DELETE' ELSE 'DELETE' END
  WHEN has_new AND NOT has_old THEN
    CASE WHEN origin = 'REPLICATION' THEN 'REPLICATED_INSERT' ELSE 'INSERT' END
  ELSE
    CASE WHEN origin = 'REPLICATION' THEN 'REPLICATED_UPDATE' ELSE 'UPDATE' END
END
"""
