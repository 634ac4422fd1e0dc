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


#: public S3 Vectors PutVectors API cap (vectors per request) — the
#: reference sends one PutVectorsRequest per KCL record batch
#: (S3VectorTargetMapper.java:169-177), which stays under this only
#: because KCL batches are small; the Spark sink chunks explicitly
PUT_VECTORS_MAX = 500


def vector_upsert_sink(
    put_batch_factory,
    key_field: str,
    embedding_col: str,
    metadata_fields: Sequence[str] = (),
    batch_size: int = PUT_VECTORS_MAX,
    max_retries: int = 3,
    registry=None,
    metrics_name: str = "vectors",
    retry_kwargs: dict | None = None,
):
    """foreachBatch sink: shape rows via :func:`vector_records` and
    put them executor-side in chunks of ``batch_size``.

    ``put_batch_factory`` is a picklable zero-arg callable returning
    the put function ``(list[Row(key,data,metadata)]) -> None`` —
    invoked once per partition on the executor (the reference's
    lazy-client-singleton, S3VectorTargetMapper.java:183-190).  Each
    put runs under the Bedrock exponential-backoff policy
    (VectorHelper.java:61-168): transient markers retry up to
    ``max_retries`` with jittered backoff; retries are counted with a
    Spark ACCUMULATOR and folded into the driver-side metrics
    registry as ``retry.vectorstore`` after the action (executor
    processes cannot reach the driver registry directly), alongside
    ``sink.<name>.{batches,failed_batches,vectors_out}``.  A put that
    exhausts retries fails the task → Spark task retry → failed
    micro-batch (checkpoint does not advance): the reference's
    at-least-once contract.
    """
    from sample_keyspaces_cdc_streams_connectors_spark.streaming.retry import with_backoff

    # ONE accumulator pair per sink instance, reused across
    # micro-batches (accumulators register in the driver for the
    # SparkContext lifetime — per-batch creation leaks registry
    # entries on long streams); per-batch counts are value deltas
    acc: dict = {}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from sample_keyspaces_cdc_streams_connectors_spark.metrics import DEFAULT_REGISTRY

        reg = registry or DEFAULT_REGISTRY
        recs = vector_records(
            batch_df, key_field, embedding_col, metadata_fields
        )
        sc = batch_df.sparkSession.sparkContext
        if not acc:
            acc["retries"] = sc.accumulator(0)
            acc["vectors"] = sc.accumulator(0)
        acc_retries, acc_vectors = acc["retries"], acc["vectors"]
        retries0, vectors0 = acc_retries.value, acc_vectors.value

        def put_partition(rows) -> None:
            put = None
            pending: list = []

            def flush() -> None:
                nonlocal put
                if not pending:
                    return
                if put is None:
                    put = with_backoff(
                        put_batch_factory(),
                        max_retries=max_retries,
                        on_retry=lambda: acc_retries.add(1),
                        **(retry_kwargs or {}),
                    )
                put(list(pending))
                acc_vectors.add(len(pending))
                pending.clear()

            for row in rows:
                pending.append(row)
                if len(pending) == batch_size:
                    flush()
            flush()

        try:
            recs.foreachPartition(put_partition)
        except Exception:
            reg.inc(f"sink.{metrics_name}.failed_batches")
            reg.inc("retry.vectorstore", acc_retries.value - retries0)
            raise
        reg.inc(f"sink.{metrics_name}.batches")
        reg.inc(
            f"sink.{metrics_name}.vectors_out", acc_vectors.value - vectors0
        )
        reg.inc("retry.vectorstore", acc_retries.value - retries0)

    return sink
