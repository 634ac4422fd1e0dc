"""Operation-type classification — the reference's most load-bearing
function, ``StreamHelpers.getOperationType`` (StreamHelpers.java:26-63):

1. null origin            -> UNKNOWN            (:36-39)
2. origin == TTL          -> TTL                (:41-42)
3. old and not new        -> DELETE / REPLICATED_DELETE   (:43-48)
4. new and not old        -> INSERT / REPLICATED_INSERT   (:49-54)
5. otherwise (both present OR both absent)
                          -> UPDATE / REPLICATED_UPDATE   (:55-61)

Rule 5 is the reference's final ``else``: a record with NEITHER image
still classifies as an update-class op (not UNKNOWN) — matched
exactly, including that quirk.

Spark-first: one ``when/otherwise`` Column expression — no UDF, fully
inside whole-stage codegen, trivially vectorized at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPERATION_TYPES = (
    "INSERT",
    "UPDATE",
    "DELETE",
    "REPLICATED_INSERT",
    "REPLICATED_UPDATE",
    "REPLICATED_DELETE",
    "TTL",
    "UNKNOWN",
)


def operation_type_column(
    origin: Column | None = None,
    new_image: Column | None = None,
    old_image: Column | None = None,
) -> Column:
    """Classification expression over (origin, newImage?, oldImage?)."""
    origin = origin if origin is not None else F.col("metadata.origin")
    new_image = new_image if new_image is not None else F.col("newImage")
    old_image = old_image if old_image is not None else F.col("oldImage")
    has_new, has_old = new_image.isNotNull(), old_image.isNotNull()

    def by_origin(user: str, repl: str) -> Column:
        return F.when(origin == "REPLICATION", F.lit(repl)).otherwise(F.lit(user))

    return (
        F.when(origin.isNull(), F.lit("UNKNOWN"))
        .when(origin == "TTL", F.lit("TTL"))
        .when(has_old & ~has_new, by_origin("DELETE", "REPLICATED_DELETE"))
        .when(has_new & ~has_old, by_origin("INSERT", "REPLICATED_INSERT"))
        # reference final else (StreamHelpers.java:55-61): both images
        # present — or both absent — is update-class
        .otherwise(by_origin("UPDATE", "REPLICATED_UPDATE"))
    )


def classify_operation(env: DataFrame) -> DataFrame:
    """Fill ``metadata.stream_operation_type`` on an envelope DataFrame."""
    return env.withColumn(
        "metadata",
        F.col("metadata").withField(
            "stream_operation_type", operation_type_column()
        ),
    )
