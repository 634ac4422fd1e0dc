"""Bucketed co-located joins — the zero-shuffle fact-fact join path.

At 100 TB the lineitem⋈orders equi-join is the dominant shuffle; if
both tables are written bucketed on the join key with the same bucket
count, Spark's scan reports the bucket hash partitioning and the
sort-merge join needs NO Exchange on either side.  This is the layout
we'd prescribe for the lakehouse tables, so pin the plan shape here.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    from sample_keyspaces_cdc_streams_connectors_spark.sources import load_table

    wh = str(tmp_path_factory.mktemp("warehouse"))
    # at 100 TB neither fact side is broadcastable — pin the SMJ path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{wh}/{name}_b")
            .saveAsTable(f"{name}_b")
        )
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for name in ("lineitem_b", "orders_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_no_exchange(bucketed):
    spark = bucketed
    df = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        spark.table("lineitem_b").l_orderkey == spark.table("orders_b").o_orderkey,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    # bucket pruning metadata reaches the scan
    assert "Bucketed: true" in plan


def test_bucketed_agg_no_exchange(bucketed):
    """groupBy on the bucket key reuses the bucket partitioning —
    the partial+final agg collapses to one stage, no shuffle."""
    from pyspark.sql import functions as F

    spark = bucketed
    df = (
        spark.table("lineitem_b")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_unbucketed(bucketed, sf_dir):
    from sample_keyspaces_cdc_streams_connectors_spark.sources import load_table

    spark = bucketed
    n_b = (
        spark.table("lineitem_b")
        .join(
            spark.table("orders_b"),
            spark.table("lineitem_b").l_orderkey
            == spark.table("orders_b").o_orderkey,
        )
        .count()
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    assert n_b == li.join(o, li.l_orderkey == o.o_orderkey).count()
