"""Salting helpers (operators/skew.py): result parity with plain
aggregation, salt spread, join-side replication."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.operators.skew import (
    add_salt,
    explode_salt,
    salted_agg,
)


def _skewed(spark):
    # key 1 is hot (90 rows), keys 2..10 have one row each
    rows = [(1, float(i)) for i in range(90)] + [
        (k, float(k)) for k in range(2, 11)
    ]
    return spark.createDataFrame(rows, "k int, v double")


def test_salted_agg_equals_plain(spark):
    df = _skewed(spark)
    salted = {
        (r.k): (r.s, r.n, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {
                "s": ("sum", F.col("v")),
                "n": ("count", F.lit(1)),
                "mx": ("max", F.col("v")),
            },
            n_salts=4,
        ).collect()
    }
    plain = {
        (r.k): (r.s, r.n, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("*").alias("n"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    df = add_salt(_skewed(spark), n_salts=8)
    spread = (
        df.filter("k = 1").select("__salt").distinct().count()
    )
    assert spread >= 4  # hot key occupies most salt buckets


def test_salt_is_deterministic(spark):
    a = add_salt(_skewed(spark), 8).collect()
    b = add_salt(_skewed(spark), 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_explode_salt_replicates_dim(spark):
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k int, name string")
    out = explode_salt(dim, 4)
    assert out.count() == 8
    assert out.filter("k = 1").select("__salt").distinct().count() == 4


def test_salted_join_parity(spark):
    """Salted fact join exploded dim == plain join."""
    fact = add_salt(_skewed(spark), 4)
    dim = spark.createDataFrame(
        [(k, f"n{k}") for k in range(1, 11)], "k int, name string"
    )
    salted = (
        fact.join(explode_salt(dim, 4), ["k", "__salt"])
        .groupBy("k", "name")
        .count()
    )
    plain = _skewed(spark).join(dim, "k").groupBy("k", "name").count()
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_non_mergeable_agg_rejected(spark):
    with pytest.raises(ValueError, match="not mergeable"):
        salted_agg(_skewed(spark), ["k"], {"a": ("avg", F.col("v"))})


def test_aqe_splits_skewed_join(spark):
    """SCALE.md claims AQE handles hot join keys at runtime — pin it:
    with a 90%-hot key and thresholds scaled to fixture size, the
    final adaptive plan must mark the sort-merge join skew=true
    (OptimizeSkewedJoin split the hot partition into subpartitions)."""
    from pyspark.sql import functions as F

    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # 90% of 40k fact rows share key 0; dim side is uniform
        fact = spark.range(40_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(0, 40_000, 7).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        joined = fact.join(dim, "k")
        # execute THIS dataset (not a derived count plan) so AQE
        # finalizes the same queryExecution we inspect
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
