"""Sink-shaping correctness queries (SURVEY §2.1 #13, #14, #17).

These oracle the *computations* behind the sinks — message chunk
assignment, time-partition paths, MV final-state reconstruction — as
pure queries DuckDB can check; the actual file/queue delivery is
exercised in pytest (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.envelope import (
    CLASSIFY_SQL_CASE,
    ENVELOPE_SQL_CTE,
    synthesize_cdc,
)
from sample_keyspaces_cdc_streams_connectors_spark.operators import classify_operation
from sample_keyspaces_cdc_streams_connectors_spark.operators.batching import (
    assign_messages,
    time_partition,
)
from sample_keyspaces_cdc_streams_connectors_spark.operators.mv import mv_apply
from sample_keyspaces_cdc_streams_connectors_spark.queries import register
from sample_keyspaces_cdc_streams_connectors_spark.sources import load_table

MAX_MSG = 4096  # small bound so sf0.01 produces many messages


def _env(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classify_operation(synthesize_cdc(load_table(spark, sf_dir, "events")))


# --- #13 size/count-bounded batching ---------------------------------------


@register(
    "batch_bounds",
    oracle=f"""
    WITH env AS ({ENVELOPE_SQL_CTE}),
    sized AS (
      SELECT user_id % 4 AS shard, seq,
             length(props) + 64 AS sz
      FROM env
    ),
    bucketed AS (
      SELECT shard, seq, sz,
             CAST(floor(
               COALESCE(SUM(sz) OVER (PARTITION BY shard ORDER BY seq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {MAX_MSG}.0) AS BIGINT) AS message_idx
      FROM sized
    )
    SELECT shard, message_idx,
           COUNT(*) AS n_records,
           CAST(SUM(sz) AS BIGINT) AS total_size,
           concat(min(seq), '-', max(seq)) AS message_id
    FROM bucketed
    GROUP BY shard, message_idx
    """,
)
def batch_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-bounded message assignment (AbstractJSONConverter.java:
    108-177 semantics; divergence note in operators/batching.py) —
    per-message record counts, byte totals and firstSeq-lastSeq ids."""
    # shard/size derived exactly like the oracle: user_id % 4,
    # length(props)+64 — an engine-agnostic serialized-size proxy.
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("shard"),
        F.lpad(F.col("event_id").cast("string"), 12, "0").alias("seq"),
        (F.length("props") + 64).cast("bigint").alias("sz"),
    )
    assigned = assign_messages(
        ev,
        shard_col="shard",
        seq_col="seq",
        size_col=F.col("sz"),
        max_message_size=MAX_MSG,
        max_records=-1,
    )
    return assigned.groupBy("shard", "message_idx", "message_id").agg(
        F.count("*").alias("n_records"),
        F.sum("sz").alias("total_size"),
    )


# --- #14 time-based partitioning -------------------------------------------


@register(
    "time_partition_counts",
    oracle="""
    SELECT strftime(ts, '%Y/%m/%d/%H') AS part, COUNT(*) AS n
    FROM events
    GROUP BY part
    """,
)
def time_partition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3TargetMapper.getPartitionPath (S3TargetMapper.java:84-136)
    at `hours` granularity, grouped — verifies the path derivation the
    partitioned sink writes under."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        time_partition(F.col("ts"), "hours").alias("part")
    ).agg(F.count("*").alias("n"))


# --- #17 MV apply (last-writer-wins) ---------------------------------------


@register(
    "mv_apply",
    oracle=f"""
    WITH env AS ({ENVELOPE_SQL_CTE}),
    classified AS (
      SELECT *, {CLASSIFY_SQL_CASE} AS op FROM env
    ),
    relevant AS (
      SELECT user_id, op, seq, event_type, value, props,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
      FROM classified WHERE op <> 'UNKNOWN'
    )
    SELECT user_id, event_type, value, props
    FROM relevant
    WHERE rn = 1
      AND op IN ('INSERT','UPDATE','REPLICATED_INSERT','REPLICATED_UPDATE')
    """,
)
def mv_apply_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyspacesViewTargetMapper (KeyspacesViewTargetMapper.java:81-154)
    re-expressed: last event per pk wins; delete-class last events
    remove the row."""
    env = _env(spark, sf_dir)
    return mv_apply(
        env, pk=["user_id"], fields=["event_type", "value", "props"]
    )
