"""Shared Spark fixtures for the engine test suite.

One session per test run (JVM start dominates), few shuffle
partitions (tiny data — 200 shuffle tasks would be pure overhead).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    from sample_keyspaces_cdc_streams_connectors_spark.session import tune

    s = (
        SparkSession.builder.appName("engine-tests")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tune(s, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def envelopes(spark, sf_dir):
    """Classified CDC envelopes synthesized from the sf0.001 events."""
    from sample_keyspaces_cdc_streams_connectors_spark.envelope import synthesize_cdc
    from sample_keyspaces_cdc_streams_connectors_spark.operators import classify_operation
    from sample_keyspaces_cdc_streams_connectors_spark.sources import load_table

    return classify_operation(
        synthesize_cdc(load_table(spark, sf_dir, "events"))
    ).cache()
