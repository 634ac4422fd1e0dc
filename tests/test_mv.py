"""MV apply: last-writer-wins reconstruction
(KeyspacesViewTargetMapper.java:81-154) — upsert binds newImage,
delete binds the key from oldImage, latest sequence wins per key."""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from sample_keyspaces_cdc_streams_connectors_spark.operators.mv import mv_apply

IMG = StructType(
    [
        StructField("k", IntegerType(), True),
        StructField("v", StringType(), True),
    ]
)
SCHEMA = StructType(
    [
        StructField(
            "metadata",
            StructType(
                [
                    StructField("stream_operation_type", StringType(), True),
                    StructField("stream_sequence_number", StringType(), True),
                ]
            ),
            False,
        ),
        StructField("newImage", IMG, True),
        StructField("oldImage", IMG, True),
    ]
)


def _env(spark, events):
    """events: (seq, op, new(k,v)|None, old(k,v)|None)"""
    rows = [
        ((op, f"{seq:06d}"), new, old) for seq, op, new, old in events
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _state(spark, events):
    out = mv_apply(_env(spark, events), pk=["k"], fields=["v"])
    return {r.k: r.v for r in out.collect()}


def test_insert_then_update(spark):
    assert _state(
        spark,
        [
            (1, "INSERT", (1, "a"), None),
            (2, "UPDATE", (1, "b"), (1, "a")),
        ],
    ) == {1: "b"}


def test_delete_wins_when_last(spark):
    assert (
        _state(
            spark,
            [
                (1, "INSERT", (1, "a"), None),
                (2, "DELETE", None, (1, "a")),
            ],
        )
        == {}
    )


def test_reinsert_after_delete(spark):
    assert _state(
        spark,
        [
            (1, "INSERT", (1, "a"), None),
            (2, "DELETE", None, (1, "a")),
            (3, "REPLICATED_INSERT", (1, "c"), None),
        ],
    ) == {1: "c"}


def test_sequence_order_not_arrival_order(spark):
    # events listed out of order; seq decides
    assert _state(
        spark,
        [
            (5, "UPDATE", (1, "late"), (1, "x")),
            (2, "INSERT", (1, "early"), None),
        ],
    ) == {1: "late"}


def test_unknown_ops_ignored(spark):
    assert _state(
        spark,
        [
            (1, "INSERT", (1, "a"), None),
            (2, "UNKNOWN", None, None),
        ],
    ) == {1: "a"}


def test_ttl_is_delete_class(spark):
    assert (
        _state(
            spark,
            [
                (1, "INSERT", (1, "a"), None),
                (2, "TTL", None, (1, "a")),
            ],
        )
        == {}
    )


def test_unbindable_key_dropped(spark):
    # a delete with no oldImage cannot bind its key -> dropped, and the
    # prior insert survives
    assert _state(
        spark,
        [
            (1, "INSERT", (1, "a"), None),
            (2, "DELETE", None, None),
        ],
    ) == {1: "a"}


def test_independent_keys(spark):
    assert _state(
        spark,
        [
            (1, "INSERT", (1, "a"), None),
            (2, "INSERT", (2, "b"), None),
            (3, "DELETE", None, (1, "a")),
        ],
    ) == {2: "b"}
