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
