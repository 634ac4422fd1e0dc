"""Vector-record construction — the S3 Vectors upsert surface.

Reference (``S3VectorTargetMapper.java:87-177``): each record becomes
``PutInputVector{key, data=float32[], metadata}`` where

- the **key field must be a string** cell; any other type is rejected
  (``:126-133``),
- the **embedding field must be a string** cell (the text to embed;
  ``:100-124``), empty text falls back to the key-field value, and a
  record with neither raises (``:104-117``),
- **metadata fields** keep their native type for
  string/int/long/float/double/boolean, decimals are stringified, and
  any other type is rejected (``:134-162``).

Here the same contract is schema-level (checked once against the
DataFrame schema, not per record — 100 TB posture) and the result is
a typed DataFrame ``(key string, data array<float>, metadata struct)``
ready for a vector-table write partitioned/bucketed by key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
)

#: metadata types kept natively (S3VectorTargetMapper.java:134-158)
_NATIVE_METADATA_TYPES = (
    StringType,
    IntegerType,
    ShortType,
    LongType,
    FloatType,
    DoubleType,
    BooleanType,
)


def embedding_input(text: Column, key: Column) -> Column:
    """The text actually sent to the embedder: non-empty text, else the
    key-field value, else error (S3VectorTargetMapper.java:104-117).

    The error branch uses ``raise_error`` — a poisoned record fails the
    micro-batch exactly like the reference's IllegalArgumentException
    fails the KCL batch (checkpoint does not advance).
    """
    key_s = key.cast("string")
    return (
        F.when(text.isNotNull() & (F.length(text) > 0), text)
        .when(key_s.isNotNull() & (F.length(key_s) > 0), key_s)
        .otherwise(
            F.raise_error(
                F.lit("No description or key field found for record")
            )
        )
    )


def vector_records(
    df: DataFrame,
    key_field: str,
    embedding_col: str,
    metadata_fields: Sequence[str] = (),
) -> DataFrame:
    """Validate and shape ``df`` into vector-store records.

    Raises ``TypeError`` at plan time for a non-string key or an
    unsupported metadata type — the schema-level analog of the
    reference's per-record rejections.
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    if key_field not in schema:
        raise KeyError(f"key field {key_field!r} not in {sorted(schema)}")
    if not isinstance(schema[key_field], StringType):
        raise TypeError(
            f"Unsupported CQL type for vector index key: {schema[key_field]}"
            " (key field must be a string — S3VectorTargetMapper.java:126-133)"
        )

    meta_cols: list[Column] = []
    for name in metadata_fields:
        if name not in schema:
            raise KeyError(f"metadata field {name!r} not in {sorted(schema)}")
        dtype = schema[name]
        if isinstance(dtype, _NATIVE_METADATA_TYPES):
            meta_cols.append(F.col(name))
        elif isinstance(dtype, DecimalType):
            # decimals stringified (S3VectorTargetMapper.java:150-153)
            meta_cols.append(F.col(name).cast("string").alias(name))
        else:
            raise TypeError(
                f"Unsupported metadata type for field {name!r}: {dtype}"
                " (S3VectorTargetMapper.java:154-158)"
            )

    return df.select(
        F.col(key_field).alias("key"),
        F.col(embedding_col).alias("data"),
        F.struct(*meta_cols).alias("metadata")
        if meta_cols
        else F.struct(F.lit(None).cast("string").alias("__none")).alias(
            "metadata"
        ),
    )
