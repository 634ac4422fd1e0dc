"""Bucketed point-in-interval range join (operators/range_join.py)."""

from __future__ import annotations

import pytest

from sample_keyspaces_cdc_streams_connectors_spark.operators.range_join import range_join


def _frames(spark):
    points = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 17), (4, 100)], "pid int, x long"
    )
    intervals = spark.createDataFrame(
        [("a", 0, 10), ("b", 10, 20), ("c", 90, 95)],
        "iid string, lo long, hi long",
    )
    return points, intervals


@pytest.mark.parametrize("width", [1, 4, 7, 100])
def test_range_join_matches_all_widths(spark, width):
    """Bucket width is a performance knob, never a correctness knob."""
    points, intervals = _frames(spark)
    out = range_join(points, intervals, "x", "lo", "hi", bucket_width=width)
    got = {(r.pid, r.iid) for r in out.collect()}
    assert got == {
        (1, "a"),   # 5 in [0,10]
        (2, "a"),   # boundary: 10 in [0,10]
        (2, "b"),   # boundary: 10 in [10,20]
        (3, "b"),   # 17 in [10,20]
        # pid 4 (x=100) matches nothing; interval c catches nobody
    }


def test_range_join_no_duplicate_pairs(spark):
    """An interval spanning many buckets still yields each pair once."""
    points, _ = _frames(spark)
    wide = points.sparkSession.createDataFrame(
        [("w", 0, 1000)], "iid string, lo long, hi long"
    )
    out = range_join(points, wide, "x", "lo", "hi", bucket_width=3)
    rows = [(r.pid, r.iid) for r in out.collect()]
    assert sorted(rows) == [(1, "w"), (2, "w"), (3, "w"), (4, "w")]


def test_range_join_is_equi_join_plan(spark):
    """The plan must be a hash/broadcast equi-join on the bucket —
    never BroadcastNestedLoopJoin/CartesianProduct."""
    points, intervals = _frames(spark)
    plan = (
        range_join(points, intervals, "x", "lo", "hi", bucket_width=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_rejects_outer(spark):
    points, intervals = _frames(spark)
    with pytest.raises(ValueError):
        range_join(points, intervals, "x", "lo", "hi", 4, how="left")
