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


def dot_wide(a: Column, b: Column, dims: int) -> Column:
    """Dot product unrolled to a ``dims``-term scalar expression.

    Same left-to-right double summation as :func:`dot` (bit-identical
    result), but with no per-row intermediate array allocation — pure
    whole-stage-codegen arithmetic.  Use on hot per-pair paths where
    the dimensionality is known (e.g. LSH candidate verification);
    ``dot`` remains for unknown-dims columns.
    """
    terms = [
        F.element_at(a, i + 1).cast("double")
        * F.element_at(b, i + 1).cast("double")
        for i in range(dims)
    ]
    return sum(terms[1:], terms[0])


def l2_norm_wide(a: Column, dims: int) -> Column:
    return F.sqrt(dot_wide(a, a, dims))
