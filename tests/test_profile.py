"""One-pass table profiler: exact metric values on a hand-built
fixture, type-specific metric sets, and the single-exchange plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def fixture(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "alpha", True),
            (2, 20.0, "", False),
            (3, None, "gamma", None),
            (4, 40.0, None, True),
        ],
        "id long, x double, s string, b boolean",
    )


def _lookup(rows):
    return {(r["column"], r["metric"]): r["value"] for r in rows}


def test_exact_values(spark, fixture):
    got = _lookup(profile_table(fixture).collect())
    assert got[("*", "rows")] == 4.0
    assert got[("x", "count")] == 3.0
    assert got[("x", "nulls")] == 1.0
    assert got[("x", "min")] == 10.0
    assert got[("x", "max")] == 40.0
    assert got[("x", "mean")] == pytest.approx(70.0 / 3)
    assert got[("x", "p50")] == 20.0  # exact at this accuracy
    assert got[("s", "empty")] == 1.0
    assert got[("s", "max_length")] == 5.0
    assert got[("b", "true_count")] == 2.0
    assert got[("id", "approx_distinct")] == 4.0


def test_column_subset_and_validation(spark, fixture):
    sub = profile_table(fixture, columns=["x"])
    cols = {r["column"] for r in sub.collect()}
    assert cols == {"*", "x"}
    with pytest.raises(ValueError):
        profile_table(fixture, columns=["nope"])


def test_complex_types_get_generic_metrics(spark):
    df = spark.createDataFrame(
        [(1, [1, 2]), (2, None)], "id long, arr array<int>"
    )
    got = _lookup(profile_table(df).collect())
    assert got[("arr", "count")] == 1.0
    assert got[("arr", "nulls")] == 1.0
    assert ("arr", "approx_distinct") not in got


def test_single_pass_plan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # the profile executes as ONE aggregate job: partial per task,
    # one exchange of sketch rows, final merge
    agg = li.agg(
        F.count("*"),
        *[F.approx_count_distinct(c) for c in ("l_orderkey", "l_partkey")],
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    # and the real profiler runs end-to-end on a wide real table
    prof = profile_table(li)
    rows = prof.collect()
    assert len(rows) > 40  # 16 columns x several metrics
    got = _lookup(rows)
    n = got[("*", "rows")]
    assert got[("l_orderkey", "count")] == n  # key column never null
