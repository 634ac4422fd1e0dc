"""As-of (backward) join — an operator Spark lacks natively.

``asof_join(left, right)`` attaches to every left row the single
latest right row with the same key and ``right_ts <= left_ts``
(DuckDB ``ASOF JOIN`` semantics, used verbatim as the oracle).

Spark-first plan: NOT a range join (which Catalyst would execute as a
join + per-key filter with quadratic skew risk).  Both sides are
UNIONED, hash-partitioned by key once, sorted by (ts, side-tag), and
the right payload is carried forward with
``last(payload, ignorenulls=True)`` over an unbounded-preceding
window.  Right rows sort before left rows at equal timestamps, so a
same-instant right row IS visible to the left row (ASOF ``>=``).

Scale: ONE shuffle of left+right (same as any keyed join), sequential
scan per partition, state = one payload struct per key — no pair
explosion regardless of how many right rows share a key.  AQE skew
splitting does not apply to window partitions, so a pathological hot
key (millions of rows) would need key-salting with per-salt-boundary
patching; at that point prefer bucketing both tables by key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of left join.

    Result = every ``left`` row plus ``prefix+right_ts`` and
    ``prefix+c`` for each ``c`` in ``right_cols``, taken from the
    latest right row at-or-before the left timestamp (nulls when none
    exists).  If several right rows share (key, ts), the carried one
    is the last in the union sort — dedupe the right side first for a
    deterministic pick.
    """
    on = list(on)
    payload = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),  # rights sort first at equal ts
        payload.alias("__payload"),
    )
    left_cols = left.columns
    l = left.select(  # noqa: E741
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    # align schemas: left keeps its full row, right rows carry nulls
    for c in left_cols:
        if c not in on and c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = r.select(l.columns).unionByName(l)

    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__carry", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__tag") == 1).select(
        *left_cols,
        F.col("__carry.__rts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"__carry.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return out
