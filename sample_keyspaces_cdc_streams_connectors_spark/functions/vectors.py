"""Vector column functions over ``array<float>`` embeddings.

The reference stores embeddings as ``List<Float>`` and delegates
similarity to S3 Vectors (VectorHelper.java:131-141); here similarity
is first-class.  All math stays JVM-side as higher-order-function
Column expressions: ``zip_with`` products + sequential ``aggregate``
sum in DOUBLE.  The left-to-right double summation is bit-reproducible
and matches an identically-written SQL oracle exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double-precision dot product."""
    prods = F.zip_with(
        a, b, lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) with 0 for zero-norm inputs (no NaN propagation)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def dot_sql(a: str, b: str) -> str:
    """SQL-text twin of :func:`dot` (r14 — each zip_with/aggregate
    HOF costs tens of ms of py4j to CONSTRUCT; the text form parses
    JVM-side in one call.  Same expression, same sequential-double
    semantics; equivalence rides the oracle gates that consume it)."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v)"
    )


def l2_norm_sql(a: str) -> str:
    """SQL-text twin of :func:`l2_norm`."""
    return f"sqrt({dot_sql(a, a)})"


# PERF note (measured, sf0.1, 490k pairs x 64 dims): among pure-SQL
# forms, keep dot products as zip_with-with-inline-casts + aggregate
# (3.0s).  Two tempting "optimizations" are strictly worse: wrapping
# the arrays in transform(x -> cast(x as double)) first adds an array
# materialization per row (4.7s), and unrolling into a 64-term
# element_at expression overflows the codegen method budget and falls
# back to interpreted evaluation (10s).  For BULK pair scoring,
# ``dot_pandas`` below beats all three (0.9s same workload) — the
# higher-order functions are interpreted per element, so Arrow batch
# transfer + numpy wins once pair counts reach the hundreds of
# thousands.


#: r15: the r14 ``asNondeterministic`` marking on :func:`dot_pandas`
#: is REVERTED (False).  The r14 rationale (guide §4.4 — stop the
#: optimizer cloning the UDF around a pushed-down filter) was plan-
#: real but harmless here: the duplicated ArrowEvalPython runs ABOVE
#: the threshold filter, i.e. only on the filter's survivors (18 rows
#: at sf0.1), so the duplication costs ~nothing — while the
#: nondeterministic flag itself measured SLOWER on two independent
#: hosts (driver r14: 1.32→1.79 s at 32c AND 2.21 s at 8c; this host
#: r15 interleaved A/B over 8 cycles: nondet min/median 1.188/1.655 s
#: vs plain 1.020/1.297 s, plain faster in 6/8 cycles).  Flag kept as
#: the A/B switch (tools/ab_r15.py).
_DOT_NONDET = False


def dot_pandas(a: Column, b: Column) -> Column:
    """Arrow-batched dot product, bit-identical to :func:`dot`.

    The reduction loops over DIMENSIONS (sequential, same IEEE add
    order as the SQL left-fold) while numpy vectorizes over ROWS, so
    results match :func:`dot` and an identically-written SQL oracle to
    the last ulp.  Preconditions: both columns hold equal-length
    numeric arrays (ragged batches would fail ``np.stack``); null
    ELEMENTS poison the row to NaN exactly as SQL nulls poison the
    fold to NULL — both are dropped by any threshold filter.

    Use for bulk candidate-pair scoring (>~100k pairs); prefer the
    pure-Column :func:`dot` inside small projections where a Python
    worker round-trip isn't worth it.
    """
    @F.pandas_udf("double")
    def _dot_seq(xs: pd.Series, ys: pd.Series) -> pd.Series:
        if len(xs) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(xs.to_numpy()).astype(np.float64)
        B = np.stack(ys.to_numpy()).astype(np.float64)
        prods = A * B
        acc = np.zeros(len(prods), dtype=np.float64)
        for i in range(prods.shape[1]):
            acc = acc + prods[:, i]
        return pd.Series(acc)

    # r14 (guide §4.4): mark non-deterministic so the optimizer cannot
    # push a filter on the RESULT below the projection and duplicate
    # the evaluation — dedup_embedding's `cos >= threshold` filter
    # produced TWO ArrowEvalPython nodes over the same pair set
    # (plans/r14/dedup_embedding_before.txt nodes 18/21), shipping
    # both embedding arrays across the Python boundary twice.  The
    # value is deterministic in reality; the flag only removes the
    # optimizer's licence to clone it.  (_DOT_NONDET is the r15 A/B
    # switch — the driver's r14 timings contradicted the win, so
    # tools/ab_r15.py re-measures both forms interleaved.)
    if _DOT_NONDET:
        return _dot_seq.asNondeterministic()(a, b)
    return _dot_seq(a, b)
