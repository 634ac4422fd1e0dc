"""Predicate filter with the reference's JEXL semantics.

Reference: a configured JEXL expression is evaluated per record over
``{metadata, newImage, oldImage}`` (``AbstractTargetMapper.java:50-88``,
``JexlFilterService.java:50-130``); an evaluation ERROR drops the
record (:76-79), and non-boolean results are coerced — strings via
``parseBoolean``, numbers via ``!= 0`` (:102-124).

Spark-first mapping: ``df.filter(F.expr(sql))`` — JEXL's operator set
(``== != > >= && || ?:``) maps 1:1 onto Spark SQL (``= <> > >= AND OR
coalesce``).  Spark expressions return NULL instead of throwing on
missing/null input (with ANSI off), and a NULL predicate drops the
row — exactly the JEXL error-drops-record behavior, for free.  The
coercions are applied when the expression isn't already boolean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, NumericType, StringType


def cdc_filter(df: DataFrame, predicate: str | None) -> DataFrame:
    """Filter with JEXL-style semantics: null/error => drop; string and
    numeric results coerced to boolean like JexlFilterService:102-124.

    A predicate referencing a column that doesn't exist drops EVERY
    record rather than failing the pipeline: JEXL raises a per-record
    eval error, and an eval error drops the record
    (JexlFilterService.java:76-79) — with the field missing from the
    schema, that's all of them.  Spark surfaces this at analysis time
    instead, so the unresolvable case maps to an empty result.
    """
    if not predicate:
        return df
    from pyspark.errors import AnalysisException

    expr = F.expr(predicate)
    try:
        dtype = df.select(expr.alias("__p")).schema["__p"].dataType
    except AnalysisException:
        return df.filter(F.lit(False))
    if isinstance(dtype, BooleanType):
        cond = expr
    elif isinstance(dtype, StringType):
        # Boolean.parseBoolean: true iff equalsIgnoreCase("true")
        cond = F.lower(expr) == "true"
    elif isinstance(dtype, NumericType):
        cond = expr != 0
    else:
        cond = expr.cast("boolean")
    # NULL predicate (missing field / cast failure) drops the row —
    # Spark's filter already treats NULL as false.
    return df.filter(cond)
