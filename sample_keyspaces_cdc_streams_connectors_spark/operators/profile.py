"""One-pass table profiling (per-column data-quality statistics).

Operating a 100 TB pipeline starts with knowing what's in the table:
null rates, cardinalities, ranges, length distributions.  The
reference has no profiling surface (its closest feature is the
console sink's record dump, DefaultKeyspacesTargetMapper.java:31-38);
warehouses grew `ANALYZE`/`SUMMARIZE` for exactly this.  This module
is the Spark-first equivalent: ONE aggregation pass computes every
column's statistics simultaneously.

Scale design: all statistics are partial-aggregatable JVM built-ins
(count / min / max / avg / HLL++ `approx_count_distinct`, plus
t-digest `approx_percentile` for numerics), so the whole profile is
one map-side-combined global aggregate — a single Exchange carrying
ONE row of sketch state per partition, regardless of table width or
row count.  The wide one-row result is driver-side reshaped to the
long (column, metric, value) form; nothing row-scaled ever reaches
the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    NumericType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

#: percentiles reported for numeric columns
_PCTS = (0.25, 0.5, 0.75)
#: t-digest accuracy (10k ≈ ±0.01% rank error; sketch ~ KBs)
_PCT_ACC = 10_000


def _metrics_for(col_name: str, dtype) -> dict[str, Column]:
    """Aggregate expressions for one column, keyed by metric name."""
    c = F.col(col_name)
    m: dict[str, Column] = {
        "count": F.count(c).cast("double"),
        "nulls": F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("double"),
    }
    if isinstance(
        dtype,
        (
            NumericType,
            StringType,
            BooleanType,
            TimestampType,
            TimestampNTZType,
            DateType,
        ),
    ):
        # HLL++ sketch — atomic types only (complex types would need
        # a canonical serialization to sketch meaningfully)
        m["approx_distinct"] = F.approx_count_distinct(c).cast("double")
    if isinstance(dtype, NumericType):
        m["min"] = F.min(c).cast("double")
        m["max"] = F.max(c).cast("double")
        m["mean"] = F.avg(c).cast("double")
        for p in _PCTS:
            m[f"p{int(p * 100)}"] = F.approx_percentile(
                c.cast("double"), F.lit(p), F.lit(_PCT_ACC)
            )
    elif isinstance(dtype, StringType):
        m["min_length"] = F.min(F.length(c)).cast("double")
        m["max_length"] = F.max(F.length(c)).cast("double")
        m["mean_length"] = F.avg(F.length(c)).cast("double")
        m["empty"] = F.sum(
            F.when(F.length(c) == 0, 1).otherwise(0)
        ).cast("double")
    elif isinstance(dtype, (TimestampType, TimestampNTZType, DateType)):
        m["min_epoch"] = F.min(F.unix_timestamp(c)).cast("double")
        m["max_epoch"] = F.max(F.unix_timestamp(c)).cast("double")
    elif isinstance(dtype, BooleanType):
        m["true_count"] = F.sum(
            F.when(c, 1).otherwise(0)
        ).cast("double")
    return m


def profile_table(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Profile ``columns`` (default: every supported column) in ONE
    aggregation pass → long frame (column string, metric string,
    value double), ordered by (column, metric).

    Unsupported types (arrays, structs, binary) get the generic
    count/null metrics only (``approx_distinct`` is gated to atomic
    types)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = list(fields)
    unknown = [c for c in columns if c not in fields]
    if unknown:
        raise ValueError(f"no such columns: {unknown}")

    aggs: list[Column] = [F.count("*").cast("double").alias("__rows")]
    layout: list[tuple[str, str]] = []
    for c in columns:
        metrics = _metrics_for(c, fields[c])
        for name, expr in metrics.items():
            aggs.append(expr.alias(f"__{len(layout)}"))
            layout.append((c, name))

    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [("*", "rows", float(row["__rows"]))]
    for i, (c, name) in enumerate(layout):
        v = row[f"__{i}"]
        out.append((c, name, None if v is None else float(v)))
    return spark.createDataFrame(
        sorted(out), "column string, metric string, value double"
    )
