"""Point-in-interval range join — bucketed, not nested-loop.

A naive ``l.x BETWEEN r.lo AND r.hi`` join has no equi-key, so Spark
executes it as BroadcastNestedLoopJoin (or cartesian) — O(|L|·|R|)
comparisons.  The scalable plan buckets the domain: every interval is
EXPLODED to the buckets it overlaps, every point maps to exactly ONE
bucket, and the join becomes an equi-join on the bucket id followed by
the exact BETWEEN filter.  Each (point, interval) pair can only meet
in the point's single bucket, so no dedup pass is needed.

Cost: |R| × (avg interval span / bucket width) exploded rows,
|L| + |R| shuffled once on the bucket key.  Pick ``bucket_width``
near the typical interval span: too small explodes intervals, too
large degrades to per-bucket nested loops.  (This is the same
blocking idea the LSH dedup uses — equi-key first, exact predicate
second.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi`` (numeric/epoch domains).

    Returns all columns of both inputs.  ``how='inner'`` only; an
    outer variant would re-join unmatched points (same plan shape).
    """
    if how != "inner":
        raise ValueError("only inner range joins are supported")

    def bucket(c: Column) -> Column:
        return F.floor(c / F.lit(bucket_width)).cast("bigint")

    exploded = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(bucket(F.col(lo_col)), bucket(F.col(hi_col)))
        ),
    )
    bucketed_points = points.withColumn("__bucket", bucket(F.col(point_col)))
    return (
        bucketed_points.join(exploded, "__bucket")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bucket")
    )
