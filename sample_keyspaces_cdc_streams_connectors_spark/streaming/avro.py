"""Avro output parity (AbstractAvroConverter.java) — semantics layer.

The reference's *default* S3 output format is Avro with per-batch
schema inference and three quirky-but-load-bearing behaviors, all
replicated here even though the external spark-avro module is absent
in this container (the column/shape transforms run identically before
a parquet fallback write):

1. **decimal-as-string** (AbstractAvroConverter.java:288-295,
   mapCqlTypeToAvroSchema "decimalt" → STRING :419-428): BigDecimal
   values are stringified to avoid Avro serialization issues.
2. **date as nullable logical-date int** (:429-436): CQL ``date``
   maps to ``["null", {"type": "int", "logicalType": "date"}]`` —
   days since epoch.  Timestamps map to plain ``long`` (:447-449).
3. **every inferred data field is a nullable union** (:470 —
   ``createUnion(NULL, schema)``), while the four include-metadata
   fields are non-null ``string`` (:352-357).
4. **one record per message by default** (:235 with the -1 default
   from :68): the Avro batcher tests ``1 + count > maxRecords``
   WITHOUT the JSON path's -1-means-unlimited guard, so the default
   config (-1) overflows on every record and each message carries
   exactly one record.

Spark-first: the value conversions are Column casts (codegen, no
UDFs); schema inference reads the DataFrame schema — the analog of
inferring from the first record with a newImage
(AbstractAvroConverter.java:339-372), but sound under schema
drift because Spark schemas are per-plan, not per-sample-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: reference schema namespace (AbstractAvroConverter.java:333-334)
AVRO_NAMESPACE = "software.amazon.ssa.streams.connector.target.s3"
AVRO_RECORD_NAME = "keyspaces_record"

#: include-metadata fields emitted as non-null string
#: (AbstractAvroConverter.java:352-357)
METADATA_STRING_FIELDS = (
    "stream_table_name",
    "stream_keyspace_name",
    "stream_sequence_number",
    "stream_operation_type",
)


def to_avro_compatible(df: DataFrame) -> DataFrame:
    """Apply the reference's value conversions ahead of an Avro (or
    fallback) write: DECIMAL → string (BigDecimal.toString analog —
    Spark's decimal→string cast keeps the declared scale), DATE →
    days-since-epoch int (Avro logical date), TIMESTAMP → epoch-millis
    long (plain Avro long, :447-449)."""
    cols: list[Column] = []
    for field in df.schema.fields:
        c = F.col(field.name)
        if isinstance(field.dataType, T.DecimalType):
            cols.append(c.cast("string").alias(field.name))
        elif isinstance(field.dataType, T.DateType):
            cols.append(
                F.datediff(c, F.lit("1970-01-01").cast("date"))
                .cast("int")
                .alias(field.name)
            )
        elif isinstance(field.dataType, T.TimestampType):
            cols.append(F.unix_millis(c).alias(field.name))
        else:
            cols.append(c)
    return df.select(*cols)


def _avro_type(dtype: T.DataType) -> object:
    """Spark type → Avro schema fragment, per the reference's CQL→Avro
    switch (mapCqlTypeToAvroSchema, AbstractAvroConverter.java:407-473).
    Raises on unmapped types like the reference's default branch."""
    if isinstance(dtype, T.DecimalType):
        return "string"  # decimalt → STRING (:419-428)
    if isinstance(dtype, T.DateType):
        return {"type": "int", "logicalType": "date"}  # datet (:429-436)
    if isinstance(dtype, (T.StringType,)):
        return "string"
    if isinstance(dtype, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dtype, (T.LongType,)):
        return "long"
    if isinstance(dtype, T.FloatType):
        return "float"
    if isinstance(dtype, T.DoubleType):
        return "double"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, T.TimestampType):
        return "long"  # timestampt → LONG (:447-449)
    if isinstance(dtype, T.BinaryType):
        return "bytes"  # blobt → BYTES (:451-453)
    raise ValueError(f"Unsupported type for Avro schema: {dtype}")


def infer_avro_schema(df: DataFrame) -> dict:
    """Inferred Avro record schema as a JSON-able dict: the reference's
    buildAvroSchema (AbstractAvroConverter.java:339-405).  Metadata
    stream_* fields are non-null ``string``; every other field is a
    ``["null", type]`` union (:470)."""
    fields = []
    for field in df.schema.fields:
        if field.name in METADATA_STRING_FIELDS:
            fields.append({"name": field.name, "type": "string"})
        else:
            mapped = _avro_type(field.dataType)
            fields.append({"name": field.name, "type": ["null", mapped]})
    return {
        "type": "record",
        "name": AVRO_RECORD_NAME,
        "namespace": AVRO_NAMESPACE,
        "fields": fields,
    }


def avro_assign_messages(
    df: DataFrame,
    shard_col: str,
    seq_col: str,
    size_col: Column,
    max_message_size: int = 256 * 1024,
    max_records: int = -1,
) -> DataFrame:
    """Message assignment with the AVRO batching quirk: the reference
    tests ``1 + currentMessageRecordCount > maxRecordsPerMessage``
    with no -1 guard (AbstractAvroConverter.java:235), so the default
    ``max_records=-1`` overflows on EVERY record — one record per
    message, regardless of size.  A positive ``max_records`` behaves
    like the JSON path's count bound."""
    from sample_keyspaces_cdc_streams_connectors_spark.operators.batching import assign_messages

    if max_records >= 0:
        return assign_messages(
            df,
            shard_col=shard_col,
            seq_col=seq_col,
            size_col=size_col,
            max_message_size=max_message_size,
            max_records=max_records,
        )
    # quirk path: every record is its own message
    w = Window.partitionBy(shard_col).orderBy(seq_col)
    out = df.withColumn("__size", size_col).withColumn(
        "message_idx", (F.row_number().over(w) - 1).cast("bigint")
    )
    return out.withColumn("message_id", F.concat_ws("-", seq_col, seq_col))
