"""Executor-side Avro container writer (streaming/avro_io.py):
byte-compatibility with the Avro JAVA reader on Spark's classpath,
partitioned layout, multi-block framing, and the object-store sink's
real-.avro path when the spark-avro DataSource is absent."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.streaming.avro_io import (
    _zigzag_long,
    write_avro_dir,
    write_container,
)


def _jvm_reader(spark):
    jvm = spark._jvm
    try:
        jvm.org.apache.avro.Schema.Parser()
    except Exception:  # pragma: no cover - classpath-dependent
        pytest.skip("Avro Java library not on the Spark classpath")
    return jvm


def _read_avro_files(spark, paths, columns):
    """Read container files through the REAL Avro Java DataFileReader."""
    jvm = _jvm_reader(spark)
    out = []
    for path in sorted(paths):
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        while reader.hasNext():
            rec = reader.next()
            vals = {}
            for name in columns:
                v = rec.get(name)
                if v is not None and not isinstance(
                    v, (int, float, str, bool, bytes)
                ):
                    cls = v.getClass().getName()
                    if cls == "java.nio.HeapByteBuffer":
                        arr = jvm.java.util.Arrays.copyOfRange(
                            v.array(),
                            v.arrayOffset() + v.position(),
                            v.arrayOffset() + v.limit(),
                        )
                        v = bytes(arr)
                    else:  # avro Utf8 and friends
                        v = str(v)
                vals[name] = v
            out.append(vals)
        reader.close()
    return out


def test_zigzag_varint_vectors():
    """Spec test vectors (Avro 1.11 spec, 'Primitive Types')."""
    assert _zigzag_long(0) == b"\x00"
    assert _zigzag_long(-1) == b"\x01"
    assert _zigzag_long(1) == b"\x02"
    assert _zigzag_long(-2) == b"\x03"
    assert _zigzag_long(2) == b"\x04"
    assert _zigzag_long(-64) == b"\x7f"
    assert _zigzag_long(64) == b"\x80\x01"


def test_container_read_back_by_java_avro(spark, tmp_path):
    """Every supported type round-trips value-identical through the
    Avro JAVA reader: nullable unions (null + present), metadata
    strings, int/long/float/double/boolean/bytes, multi-block files."""
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "stream_sequence_number", "type": "string"},
            {"name": "a", "type": ["null", "long"]},
            {"name": "b", "type": ["null", "double"]},
            {"name": "c", "type": ["null", "string"]},
            {"name": "d", "type": ["null", "boolean"]},
            {"name": "e", "type": ["null", "bytes"]},
            {"name": "f", "type": ["null", {"type": "int", "logicalType": "date"}]},
        ],
    }
    rows = [
        ("s1", 1, 2.5, "héllo ¢", True, b"\x00\xff", 19000),
        ("s2", None, None, None, None, None, None),
        ("s3", -(2**40), -0.125, "", False, b"", 0),
    ] * 4  # 12 rows with block_records=5 -> 3 blocks
    path = str(tmp_path / "t.avro")
    n = write_container(path, schema, rows, block_records=5)
    assert n == 12
    cols = [f["name"] for f in schema["fields"]]
    got = _read_avro_files(spark, [path], cols)
    assert len(got) == 12
    for want, have in zip(rows, (tuple(g[c] for c in cols) for g in got)):
        assert want == have


def test_write_avro_dir_distributed_and_partitioned(spark, tmp_path):
    """Distributed write: one file per (task, partition value); the
    Java reader recovers exactly the input rows per partition dir."""
    df = (
        spark.range(40)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") * 1.5).alias("v"),
        )
        .repartition(4)
    )
    out = str(tmp_path / "d")
    write_avro_dir(df, out, partition_col="g")
    dirs = sorted(os.listdir(out))
    assert dirs == ["g=0", "g=1", "g=2"]
    all_rows = []
    for d in dirs:
        files = glob.glob(os.path.join(out, d, "*.avro"))
        assert files
        rows = _read_avro_files(spark, files, ["k", "v"])
        gval = int(d.split("=")[1])
        assert all(r["k"] % 3 == gval for r in rows)
        all_rows.extend(rows)
    want = {(r.k, r.v) for r in df.collect()}
    assert {(r["k"], r["v"]) for r in all_rows} == want


def test_object_store_sink_writes_real_avro_without_module(
    spark, envelopes, tmp_path
):
    """With spark-avro absent, output_format='avro' now lands REAL
    .avro container files (not a parquet fallback), with the
    reference value semantics applied (decimal stringified)."""
    from sample_keyspaces_cdc_streams_connectors_spark.operators import shape_output
    from sample_keyspaces_cdc_streams_connectors_spark.streaming.sinks import (
        _avro_available,
        object_store_sink,
    )

    if _avro_available(spark):  # pragma: no cover - module present
        pytest.skip("spark-avro present: DataSource path covered elsewhere")

    out = str(tmp_path / "avro_objects")
    batch = shape_output(envelopes.limit(50)).withColumn(
        "price", F.lit("3.14").cast("decimal(10,2)")
    )
    object_store_sink(out, granularity="hours", output_format="avro")(
        batch, 0
    )
    files = glob.glob(f"{out}/__part=*/*.avro")
    assert files and not glob.glob(f"{out}/__part=*/*.parquet")
    rows = _read_avro_files(spark, files, ["event_id", "price"])
    assert len(rows) == 50
    assert {r["price"] for r in rows} == {"3.14"}  # decimal-as-string


def test_read_avro_dir_roundtrip_with_partitions(spark, tmp_path):
    """write_avro_dir -> read_avro_dir round-trips values and
    recovers the Hive-style partition column (unescaped)."""
    from sample_keyspaces_cdc_streams_connectors_spark.streaming.avro_io import read_avro_dir

    df = (
        spark.range(30)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("2024/01/0"), (F.col("id") % 2 + 1).cast("string")).alias("part"),
            (F.col("id") * 0.5).alias("v"),
            F.when(F.col("id") % 5 == 0, None)
            .otherwise(F.concat(F.lit("s"), F.col("id").cast("string")))
            .alias("s"),
        )
        .repartition(3)
    )
    out = str(tmp_path / "rt")
    write_avro_dir(df, out, partition_col="part")
    # slashes in the partition value must be escaped on disk...
    assert glob.glob(os.path.join(out, "part=2024%2F01%2F0*"))
    back = read_avro_dir(spark, out, partition_col="part")
    got = {(r.k, r.part, r.v, r.s) for r in back.collect()}
    want = {(r.k, r.part, r.v, r.s) for r in df.collect()}
    assert got == want


def test_decoder_reads_jvm_written_deflate_container(spark, tmp_path):
    """Cross-validation in the OTHER direction: a container written
    by the Avro JAVA DataFileWriter (deflate codec) decodes
    value-identical with the engine's pure-Python reader."""
    import json as _json

    jvm = _jvm_reader(spark)
    from sample_keyspaces_cdc_streams_connectors_spark.streaming.avro_io import decode_container

    schema_json = _json.dumps(
        {
            "type": "record",
            "name": "x",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": ["null", "string"]},
            ],
        }
    )
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    container = jvm.org.apache.avro.file.DataFileWriter(writer)
    container.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    path = str(tmp_path / "jvm_deflate.avro")
    container.create(schema, jvm.java.io.File(path))
    datum_reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    for i in range(200):
        payload = _json.dumps(
            {"a": i, "b": None if i % 7 == 0 else {"string": f"v{i}"}}
        )
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(
            schema, payload
        )
        container.append(datum_reader.read(None, dec))
    container.close()

    with open(path, "rb") as fh:
        got_schema, rows = decode_container(fh.read())
    assert [f["name"] for f in got_schema["fields"]] == ["a", "b"]
    assert len(rows) == 200
    for i, (a, b) in enumerate(rows):
        assert a == i
        assert b == (None if i % 7 == 0 else f"v{i}")


def test_negative_count_metadata_block_decodes():
    """Spec-valid containers may write map blocks with a NEGATIVE
    count (abs value, preceded by ONE byte-size long) — the decoder
    must read the size once per block, not once per entry."""
    from sample_keyspaces_cdc_streams_connectors_spark.streaming.avro_io import (
        MAGIC,
        _encode_bytes,
        _encode_str,
        _zigzag_long,
        decode_container,
    )

    schema = {"type": "record", "name": "n", "fields": [{"name": "a", "type": "long"}]}
    import json as _json

    entries = (
        _encode_str("avro.schema")
        + _encode_bytes(_json.dumps(schema).encode())
        + _encode_str("avro.codec")
        + _encode_bytes(b"null")
    )
    sync = b"\x07" * 16
    data = (
        MAGIC
        + _zigzag_long(-2)          # negative count: 2 entries
        + _zigzag_long(len(entries))  # ONE size long for the block
        + entries
        + _zigzag_long(0)
        + sync
        # one data block: 1 record, value 5
        + _zigzag_long(1)
        + _zigzag_long(len(_zigzag_long(5)))
        + _zigzag_long(5)
        + sync
    )
    got_schema, rows = decode_container(data)
    assert got_schema["name"] == "n"
    assert rows == [(5,)]


def test_inprogress_files_invisible_and_uri_rejected(spark, tmp_path):
    """A crashed task's *.avro.inprogress leftover must be ignored by
    the reader (only committed files match the glob), and schemed
    URIs are rejected rather than shadowed by a local path."""
    from sample_keyspaces_cdc_streams_connectors_spark.streaming.avro_io import read_avro_dir

    df = spark.range(10).selectExpr("id as k", "cast(id * 2.0 as double) as v")
    out = str(tmp_path / "d")
    write_avro_dir(df.repartition(2), out)
    # simulate a task that died mid-write
    junk = os.path.join(out, "part-99999-dead.avro.inprogress")
    with open(junk, "wb") as fh:
        fh.write(b"Obj\x01truncated-garbage")
    back = read_avro_dir(spark, out)
    assert back.count() == 10  # garbage never scanned

    with pytest.raises(ValueError, match="task-visible filesystem"):
        write_avro_dir(df, "s3a://bucket/prefix")
