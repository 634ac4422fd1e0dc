"""Multi-dimensional data layout (Z-order clustering) for scan pruning.

A 100 TB table is pruned, not scanned: parquet keeps min/max
statistics per file and row group, and the reader skips units whose
range excludes the predicate.  Sorting by ONE column makes only that
column's ranges tight; interleaving the bits of several columns'
rank-buckets (the classic Z-order / Morton curve, the public
technique behind `OPTIMIZE ZORDER BY`) keeps the ranges of EVERY
participating column narrow in every file, so point/range predicates
on any of them skip most of the table.

Reference tie-in: the reference's only layout control is the S3 time
prefix (S3TargetMapper.java:84-136) — one dimension, covered by
``operators.batching.time_partition``.  This module generalizes to
multi-column locality for the analytics/LLM tables (e.g. events by
(user_id, ts), documents by (lang, quality)).

Scale design:
- Per column, rank-buckets come from ``approxQuantile`` boundaries
  (driver-side, one pass, Greenwald-Khanna sketch) — equi-DEPTH bins,
  so skew in a column costs resolution, not correctness; the bucket
  lookup is an O(2^bits) fold over a literal boundary array inside
  codegen (no join, no shuffle).
- The z-value is pure bit arithmetic (shifts/masks) — JVM-side.
- The write is ``repartitionByRange(z)`` (ONE range-partitioned
  shuffle; contiguous z-ranges per file) + ``sortWithinPartitions``
  (no extra exchange) — exactly the cost of any global sort, paid
  once at layout time.
- Effectiveness is verified physically in tests/test_layout.py: file
  min/max footers (via pyarrow) admit strictly fewer files for
  predicates on BOTH dimensions than a single-column sort layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_by_bounds(col: Column, bounds: list[float]) -> Column:
    """Equi-depth bucket id of ``col`` against sorted literal
    boundaries: count of boundaries <= value (one codegen fold, no
    join).  NULLs land in bucket 0 (first, like a NULLS FIRST sort)."""
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    c = col.cast("double")
    return F.coalesce(
        F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc + F.when(c >= b, 1).otherwise(0),
        ),
        F.lit(0),
    )


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton interleave: bit ``i`` of bucket ``j`` lands at position
    ``i * n + j`` — pure shift/mask arithmetic on longs."""
    n = len(buckets)
    z = F.lit(0).cast("long")
    for j, b in enumerate(buckets):
        bl = b.cast("long")
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(bl, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return z


def zorder_column(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    rel_err: float = 0.01,
    out_col: str = "__z",
) -> DataFrame:
    """Append the Z-order value over ``cols`` (numeric/temporal).

    One ``approxQuantile`` pass per column fixes 2^bits equi-depth
    boundaries; everything row-wise is a single JVM projection."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1,16], got {bits}")
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns (else just sort)")
    n_bounds = (1 << bits) - 1
    probs = [(i + 1) / (n_bounds + 1) for i in range(n_bounds)]
    doubled = df.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    )
    # ONE multi-column approxQuantile call = one scan for all
    # boundary sets (the per-column form would launch a full
    # Greenwald-Khanna pass per clustered column)
    all_bounds = doubled.approxQuantile(cols, probs, rel_err)
    buckets = [
        _bucket_by_bounds(F.col(c), sorted(set(bounds)))
        for c, bounds in zip(cols, all_bounds)
    ]
    return df.withColumn(out_col, _interleave(buckets, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 64,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve over
    ``cols``: one shuffle keyed by the Morton super-cell + an
    in-partition sort, laid out as one ``z_cell=K`` partition
    directory per cell.  ``n_files`` is rounded UP to the next power
    of two (cells are named by the top z bits, so cell counts are
    binary by construction — 48 requested cells yields 64).  Readers
    see ``z_cell`` as a partition column; the pruning payoff needs no
    predicate on it — every data file's per-column min/max footer
    spans exactly one cell, so stats-based skipping works on EVERY
    z-ordered column."""
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")
    z = zorder_column(df, cols, bits=bits)
    # Deterministic cell → file assignment: the top-log2(n_cells)
    # z bits name a Morton super-cell, written as a partition
    # directory.  Range-sampling boundaries (repartitionByRange on z)
    # were measured to straddle cells systematically — every
    # straddling file unions two cells' ranges and doubles its
    # admitted width — whereas one-cell-per-file keeps every file's
    # per-column range exactly one cell wide.  Equi-depth buckets
    # make cell populations near-equal, so file sizes balance.
    n_cells = 1 << (n_files - 1).bit_length()  # next power of two
    cell_shift = max(len(cols) * bits - (n_cells.bit_length() - 1), 0)
    (
        z.withColumn("z_cell", F.shiftright(F.col("__z"), cell_shift))
        .repartition(n_cells, F.col("z_cell"))
        .sortWithinPartitions("z_cell", "__z")
        .drop("__z")
        .write.mode("overwrite")
        .partitionBy("z_cell")
        .parquet(path)
    )
