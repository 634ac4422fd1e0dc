"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC pipeline on sf0.001 — envelope synthesis →
    op classification → filter → shape → per-op/hour rollup."""
    from sample_keyspaces_cdc_streams_connectors_spark.envelope import synthesize_cdc
    from sample_keyspaces_cdc_streams_connectors_spark.operators import cdc_filter, classify_operation, shape_output
    from sample_keyspaces_cdc_streams_connectors_spark.session import tune
    from sample_keyspaces_cdc_streams_connectors_spark.sources import load_table

    from pyspark.sql import functions as F

    tune(spark)
    sf_dir = "/root/testdata/sf0.001"
    env = classify_operation(synthesize_cdc(load_table(spark, sf_dir, "events")))
    env = cdc_filter(env, "metadata.stream_operation_type <> 'UNKNOWN'")
    shaped = shape_output(env, record_format="default", include_metadata=True)
    return shaped.groupBy("stream_operation_type").agg(
        F.count("*").alias("n"),
        F.min("stream_sequence_number").alias("first_seq"),
        F.max("stream_sequence_number").alias("last_seq"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from sample_keyspaces_cdc_streams_connectors_spark.queries import load_all

    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    from sample_keyspaces_cdc_streams_connectors_spark.queries import load_all

    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
