"""Projection / image-shaping / metadata-enrichment operators.

Reference behaviors re-expressed as Column expressions:

- ``fields-to-include`` whitelist on image cells
  (``AbstractJSONConverter.java:243-267``,
  ``AbstractAvroConverter.java:173,182,499-506``) -> struct re-select.
- ``record-format`` shaping (``AbstractJSONConverter.java:218-231``,
  ``AbstractAvroConverter.java:100-134,380-385``):
  * default / ``fields-only``: emit ``coalesce(newImage, oldImage)``
  * ``new-image`` / ``old-image``: that image only
  * ``full``: both images; Avro flattens the old image under an
    ``old_`` prefix.
  * the old image is force-included for DELETE / REPLICATED_DELETE /
    TTL in any format (delete payloads live in the old image).
- metadata enrichment (``AbstractJSONConverter.java:207-215``,
  ``AbstractAvroConverter.java:161-166,352-357``): stream_* fields
  prepended when ``include-metadata`` (default true).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

DELETE_OPS = ("DELETE", "REPLICATED_DELETE", "TTL")


def _image_fields(df: DataFrame, image_col: str) -> list[str]:
    dtype = df.schema[image_col].dataType
    assert isinstance(dtype, StructType), f"{image_col} must be a struct"
    return [f.name for f in dtype.fields]


def _subset_struct(col: Column, keep: Sequence[str]) -> Column:
    return F.struct(*[col.getField(f).alias(f) for f in keep])


def project_fields(df: DataFrame, fields: Sequence[str] | None) -> DataFrame:
    """Apply the ``fields-to-include`` whitelist to both images.

    Like the reference, unknown names are ignored and whitelist order
    does not matter — image field order is preserved.
    """
    if not fields:
        return df
    out = df
    for image in ("newImage", "oldImage"):
        if image not in df.columns:
            continue
        keep = [f for f in _image_fields(df, image) if f in set(fields)]
        out = out.withColumn(
            image,
            F.when(
                F.col(image).isNotNull(), _subset_struct(F.col(image), keep)
            ),
        )
    return out


def coalesce_image(df: DataFrame) -> Column:
    """Default record-format image: newImage else oldImage
    (AbstractJSONConverter.java:222-226)."""
    return F.coalesce(F.col("newImage"), F.col("oldImage"))


def flatten_full_image(df: DataFrame, prefix: str = "old_") -> DataFrame:
    """``record-format = full`` Avro shape: new-image fields at the top
    level plus old-image fields under ``old_`` prefix
    (AbstractAvroConverter.java:100-134,380-385)."""
    cols: list[Column] = [
        c for c in df.columns if c not in ("newImage", "oldImage")
    ]
    cols = [F.col(c) for c in cols]
    for f in _image_fields(df, "newImage"):
        cols.append(F.col("newImage").getField(f).alias(f))
    for f in _image_fields(df, "oldImage"):
        cols.append(F.col("oldImage").getField(f).alias(prefix + f))
    return df.select(*cols)


def enrich_metadata(df: DataFrame, include_metadata: bool = True) -> DataFrame:
    """Surface the stream_* metadata fields as top-level columns."""
    if not include_metadata:
        return df
    meta = df.schema["metadata"].dataType
    assert isinstance(meta, StructType)
    out = df
    for f in meta.fields:
        out = out.withColumn(f.name, F.col("metadata").getField(f.name))
    return out


def shape_output(
    df: DataFrame,
    record_format: str = "default",
    fields: Sequence[str] | None = None,
    include_metadata: bool = True,
) -> DataFrame:
    """Full reference output shaping: whitelist -> image select ->
    delete-forces-old-image -> flatten -> metadata enrich.

    Returns a flat DataFrame (image fields at top level) ready for
    serialization — the Spark analog of the converter output map IR
    (AbstractAvroConverter.java:152-195).
    """
    df = project_fields(df, fields)
    op = F.col("metadata.stream_operation_type")
    is_delete = op.isin(*DELETE_OPS)
    if record_format == "full":
        shaped = flatten_full_image(df)
    else:
        if record_format == "new-image":
            image = F.when(is_delete, coalesce_image(df)).otherwise(
                F.col("newImage")
            )
        elif record_format == "old-image":
            image = F.col("oldImage")
        else:  # default / fields-only: coalesce; deletes naturally fall
            # back to the old image
            image = coalesce_image(df)
        shaped = df.withColumn("__image", image)
        cols = [c for c in shaped.columns if c not in ("newImage", "oldImage", "__image")]
        cols = [F.col(c) for c in cols] + [
            F.col("__image").getField(f).alias(f)
            for f in _image_fields(df, "newImage")
        ]
        shaped = shaped.select(*cols)
    if include_metadata:
        shaped = enrich_metadata(shaped)
    return shaped.drop("metadata")
