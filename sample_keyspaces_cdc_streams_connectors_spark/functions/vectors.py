"""Vector column functions over ``array<float>`` embeddings.

The reference stores embeddings as ``List<Float>`` and delegates
similarity to S3 Vectors (VectorHelper.java:131-141); here similarity
is first-class.  All math stays JVM-side as higher-order-function
Column expressions: ``zip_with`` products + sequential ``aggregate``
sum in DOUBLE.  The left-to-right double summation is bit-reproducible
and matches an identically-written SQL oracle exactly.
"""

from __future__ import annotations

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


# PERF note (measured, sf0.1, 490k pairs x 64 dims): keep dot products
# as zip_with-with-inline-casts + aggregate (3.0s).  Two tempting
# "optimizations" are strictly worse: wrapping the arrays in
# transform(x -> cast(x as double)) first adds an array
# materialization per row (4.7s), and unrolling into a 64-term
# element_at expression overflows the codegen method budget and falls
# back to interpreted evaluation (10s).
