"""Operation-classification truth table — the engine mirror of
StreamHelpers.getOperationType (StreamHelpers.java:26-63), including
the TTL-beats-images and null-origin rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from sample_keyspaces_cdc_streams_connectors_spark.operators.classify import (
    OPERATION_TYPES,
    classify_operation,
)

IMG = StructType([StructField("v", IntegerType(), True)])
SCHEMA = StructType(
    [
        StructField(
            "metadata",
            StructType(
                [
                    StructField("stream_keyspace_name", StringType(), True),
                    StructField("stream_table_name", StringType(), True),
                    StructField("stream_operation_type", StringType(), True),
                    StructField("origin", StringType(), True),
                ]
            ),
            False,
        ),
        StructField("newImage", IMG, True),
        StructField("oldImage", IMG, True),
    ]
)


def mk(spark, origin, new, old):
    row = (
        ("ks", "tbl", None, origin),
        (new,) if new is not None else None,
        (old,) if old is not None else None,
    )
    return spark.createDataFrame([row], SCHEMA)


TRUTH_TABLE = [
    # (origin, newImage?, oldImage?) -> expected op
    ("USER", 1, None, "INSERT"),
    ("REPLICATION", 1, None, "REPLICATED_INSERT"),
    ("USER", 1, 2, "UPDATE"),
    ("REPLICATION", 1, 2, "REPLICATED_UPDATE"),
    ("USER", None, 2, "DELETE"),
    ("REPLICATION", None, 2, "REPLICATED_DELETE"),
    # TTL wins regardless of image shape (StreamHelpers.java:41-42)
    ("TTL", 1, 2, "TTL"),
    ("TTL", None, 2, "TTL"),
    # null origin -> UNKNOWN before any image check (:36-39)
    (None, 1, None, "UNKNOWN"),
    (None, None, None, "UNKNOWN"),
    # neither image present with a real origin: the reference's final
    # else classifies this as update-class (StreamHelpers.java:55-61) —
    # matched exactly, quirk included
    ("USER", None, None, "UPDATE"),
    ("REPLICATION", None, None, "REPLICATED_UPDATE"),
]


@pytest.mark.parametrize("origin,new,old,expected", TRUTH_TABLE)
def test_truth_table(spark, origin, new, old, expected):
    out = classify_operation(mk(spark, origin, new, old)).select(
        F.col("metadata.stream_operation_type").alias("op")
    )
    assert out.collect()[0].op == expected


def test_all_op_types_reachable(envelopes):
    """The synthesized sf0.001 envelope stream covers the full enum."""
    seen = {
        r.op
        for r in envelopes.select(
            F.col("metadata.stream_operation_type").alias("op")
        )
        .distinct()
        .collect()
    }
    assert seen == set(OPERATION_TYPES)


def test_classification_is_codegen_friendly(envelopes):
    """No Python UDFs in the plan — classification must stay JVM-side."""
    plan = envelopes._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
