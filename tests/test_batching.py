"""Size/count-bounded message batching + time partitioning
(AbstractJSONConverter.java:108-177, S3TargetMapper.java:84-136)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.operators.batching import (
    assign_messages,
    time_partition,
)


def _records(spark, n=20, size=100):
    rows = [("s1", f"{i:06d}", size) for i in range(n)]
    return spark.createDataFrame(rows, "shard string, seq string, nbytes long")


def test_size_bound(spark):
    # 20 records x 100 B, max 250 B -> floor(run/250): 2 per message
    df = assign_messages(
        _records(spark),
        shard_col="shard",
        seq_col="seq",
        size_col=F.col("nbytes"),
        max_message_size=250,
    )
    # floor(100*i/250) crosses a boundary every 250 B: buckets of 3,2,3,2...
    per_msg = df.groupBy("message_idx").count().collect()
    assert all(r["count"] <= 3 for r in per_msg)
    assert df.select("message_idx").distinct().count() == 8


def test_count_bound(spark):
    df = assign_messages(
        _records(spark),
        shard_col="shard",
        seq_col="seq",
        size_col=F.col("nbytes"),
        max_message_size=1 << 30,
        max_records=7,
    )
    counts = sorted(
        r["count"] for r in df.groupBy("message_idx").count().collect()
    )
    assert counts == [6, 7, 7]


def test_unlimited_records_default(spark):
    """max_records=-1 means unlimited (JSON default,
    AbstractJSONConverter.java:140-148)."""
    df = assign_messages(
        _records(spark),
        shard_col="shard",
        seq_col="seq",
        size_col=F.col("nbytes"),
        max_message_size=1 << 30,
        max_records=-1,
    )
    assert df.select("message_idx").distinct().count() == 1


def test_avro_quirk_one_record_per_message(spark):
    """The reference's Avro path omits the -1 guard so every record is
    its own message (AbstractAvroConverter.java:235) — engine exposes
    the same behavior via max_records=1."""
    df = assign_messages(
        _records(spark),
        shard_col="shard",
        seq_col="seq",
        size_col=F.col("nbytes"),
        max_records=1,
    )
    assert df.select("message_idx").distinct().count() == 20


def test_message_id_is_seq_range(spark):
    df = assign_messages(
        _records(spark, n=4, size=100),
        shard_col="shard",
        seq_col="seq",
        size_col=F.col("nbytes"),
        max_message_size=200,
    )
    ids = {r.message_id for r in df.select("message_id").distinct().collect()}
    assert ids == {"000000-000001", "000002-000003"}


def test_oversize_record_isolated(spark):
    """A record larger than max_size still lands in exactly one message
    (the reference sends it alone; both respect determinism)."""
    rows = [("s1", "000000", 50), ("s1", "000001", 900), ("s1", "000002", 50)]
    df = assign_messages(
        spark.createDataFrame(rows, "shard string, seq string, nbytes long"),
        shard_col="shard",
        seq_col="seq",
        size_col=F.col("nbytes"),
        max_message_size=100,
    )
    out = {r.seq: r.message_idx for r in df.collect()}
    assert len(set(out.values())) >= 2  # the big record forces a boundary


@pytest.mark.parametrize(
    "gran,expected",
    [
        ("years", "2024"),
        ("days", "2024/03/05"),
        ("seconds", "2024/03/05/17/30/09"),
    ],
)
def test_time_partition_granularity(spark, gran, expected):
    df = spark.createDataFrame(
        [("2024-03-05 17:30:09",)], "t string"
    ).select(time_partition(F.col("t").cast("timestamp"), gran).alias("p"))
    assert df.collect()[0].p == expected


def test_time_partition_bad_granularity():
    with pytest.raises(ValueError):
        time_partition(F.lit("x").cast("timestamp"), "fortnights")
