"""Distributed Avro CONTAINER writes — no spark-avro module needed.

The reference's default S3 object format is Avro
(S3TargetMapper.java:70-76); its converter serializes each record
with the Avro Java library (AbstractAvroConverter.java:146-270).
This container lacks the external spark-avro DataSource (vendoring
probe: no network), so this module implements the small, stable
subset of the `Avro 1.11 spec <https://avro.apache.org/docs/1.11.1/
specification/>`_ the engine's inferred schemas actually use — flat
records of primitives and ``["null", primitive]`` unions — and
writes real ``.avro`` object-container files from EXECUTORS
(``foreachPartition``, one file per task per partition-dir), so the
write distributes exactly like the parquet path.

Everything here is validated against the Avro JAVA implementation on
Spark's classpath (tests read the files back through
``DataFileReader`` + ``SpecificDatumReader``): the header layout
(magic ``Obj\\x01``, metadata map with ``avro.schema``/``avro.codec``,
16-byte sync marker), zig-zag varint longs, little-endian
float/double, length-prefixed UTF-8/bytes, and per-block
count+size+payload+sync framing are byte-compatible.

Scale notes: encoding is per-row Python in the sink task — the same
role (and cost center) as the reference's per-record
``GenericRecord`` construction; rows never funnel through the
driver, files are append-only with task-unique names (idempotent
under at-least-once redelivery, like the sequence-ranged S3 object
names), and a partition's rows stream through constant memory
(blocks flush every ``block_records``).
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame

from sample_keyspaces_cdc_streams_connectors_spark.streaming.avro import infer_avro_schema

MAGIC = b"Obj\x01"

__all__ = [
    "decode_container",
    "encode_record",
    "read_avro_dir",
    "write_avro_dir",
    "write_container",
]


def _zigzag_long(n: int) -> bytes:
    """Avro long: zig-zag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_bytes(b: bytes) -> bytes:
    return _zigzag_long(len(b)) + b


def _encode_str(s: str) -> bytes:
    return _encode_bytes(s.encode("utf-8"))


def _base_type(schema) -> str:
    """Primitive name of a non-union schema fragment (logical types
    ride their base primitive)."""
    if isinstance(schema, dict):
        return schema["type"]
    return schema


def _encode_primitive(value, schema) -> bytes:
    t = _base_type(schema)
    if t == "string":
        return _encode_str(value)
    if t in ("int", "long"):
        return _zigzag_long(int(value))
    if t == "double":
        return struct.pack("<d", float(value))
    if t == "float":
        return struct.pack("<f", float(value))
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t == "bytes":
        return _encode_bytes(bytes(value))
    if t == "null":
        return b""
    raise ValueError(f"unsupported Avro type: {schema!r}")


def _encode_field(value, schema) -> bytes:
    if isinstance(schema, list):  # union: zig-zag branch index + value
        if value is None:
            idx = schema.index("null")
            return _zigzag_long(idx)
        idx, branch = next(
            (i, s) for i, s in enumerate(schema) if s != "null"
        )
        return _zigzag_long(idx) + _encode_primitive(value, branch)
    if value is None:
        raise ValueError(f"null value for non-null Avro field {schema!r}")
    return _encode_primitive(value, schema)


def encode_record(row, field_schemas: list[tuple[int, object]]) -> bytes:
    """One record body: fields in schema order, no per-record framing
    (the container's block does the framing).  ``field_schemas`` is
    [(row_index, schema_fragment), ...] prepared once per file."""
    return b"".join(
        _encode_field(row[i], schema) for i, schema in field_schemas
    )


def _header(schema: dict, sync: bytes) -> bytes:
    """Container header: magic, metadata map (one block, then the
    zero terminator), sync marker."""
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": b"null",
    }
    buf = io.BytesIO()
    buf.write(MAGIC)
    buf.write(_zigzag_long(len(meta)))
    for k, v in meta.items():
        buf.write(_encode_str(k))
        buf.write(_encode_bytes(v))
    buf.write(_zigzag_long(0))
    buf.write(sync)
    return buf.getvalue()


def write_container(
    path: str,
    schema: dict,
    rows: Iterable,
    field_indexes: list[int] | None = None,
    block_records: int = 1000,
) -> int:
    """Write ``rows`` (Row/tuple-likes, positionally aligned with
    ``schema['fields']`` or remapped via ``field_indexes``) as one
    Avro object-container file.  Returns the record count."""
    fields = schema["fields"]
    idx = field_indexes or list(range(len(fields)))
    field_schemas = [(i, f["type"]) for i, f in zip(idx, fields)]
    sync = uuid.uuid4().bytes
    n_total = 0
    with open(path, "wb") as fh:
        fh.write(_header(schema, sync))
        block: list[bytes] = []

        def flush() -> None:
            nonlocal n_total
            n_total += len(block)
            _flush_block(fh, sync, block)

        for row in rows:
            block.append(encode_record(row, field_schemas))
            if len(block) >= block_records:
                flush()
        flush()
    return n_total


def _flush_block(fh, sync: bytes, block: list[bytes]) -> None:
    if not block:
        return
    payload = b"".join(block)
    fh.write(_zigzag_long(len(block)))
    fh.write(_zigzag_long(len(payload)))
    fh.write(payload)
    fh.write(sync)
    block.clear()


#: characters Hive/Spark escape in partition directory names
#: (ExternalCatalogUtils.charToEscape) — matching the parquet/json
#: writers' layout exactly, so readers treat both alike
_ESCAPE_CHARS = set('"#%\'*/:=?\\{[]^\x7f') | {
    chr(i) for i in range(0x20)
}


def _escape_part(value) -> str:
    if value is None:
        return "__HIVE_DEFAULT_PARTITION__"
    s = str(value)
    return "".join(
        f"%{ord(c):02X}" if c in _ESCAPE_CHARS else c for c in s
    )


def write_avro_dir(
    df: DataFrame,
    out_dir: str,
    partition_col: str | None = None,
    block_records: int = 1000,
) -> None:
    """Distributed ``.avro`` write: each task writes one container
    file per (task, partition-value) under
    ``out_dir[/<partition_col>=<value>]/part-<task>-<uuid>.avro``.

    Mirrors the parquet writer's append layout — unique file names
    make redelivered micro-batches add files, never corrupt them.
    Files COMMIT atomically: each task writes ``*.avro.inprogress``
    and renames on success, so a failed/retried task can only leave
    an in-progress file that readers never match (the glob admits
    ``*.avro`` alone) — truncated containers are unobservable.  (A
    retried task that died AFTER its renames can still duplicate a
    partition's rows — the same at-least-once contract as every sink
    here; keep speculative execution off for this writer.)
    The Avro schema is inferred from ``df`` minus the partition
    column (``streaming.avro.infer_avro_schema`` — the reference's
    nullable-union inference); decimal/date/timestamp columns must be
    lowered FIRST via ``streaming.avro.to_avro_compatible`` (the
    object-store sink does this; the schema maps them to
    string/int/long and the encoder expects those Python types).  Requires a task-visible filesystem
    path (local/NFS/fuse mount), like every local-dir transport in
    the engine; a schemed URI (s3a://, hdfs://) raises rather than
    writing to a look-alike local directory — object-store writes go
    through the reference's SDK client seam instead."""
    if "://" in out_dir:
        raise ValueError(
            f"write_avro_dir needs a task-visible filesystem path, got "
            f"URI {out_dir!r} (use the spark-avro DataSource or an SDK "
            "client sink for object stores)"
        )
    data_cols = [c for c in df.columns if c != partition_col]
    schema = infer_avro_schema(df.select(*data_cols))
    all_cols = list(df.columns)
    data_idx = [all_cols.index(c) for c in data_cols]
    part_idx = all_cols.index(partition_col) if partition_col else None

    def write_partition(rows: Iterator) -> None:
        from pyspark import TaskContext

        tc = TaskContext.get()
        task = tc.partitionId() if tc is not None else 0
        tag = uuid.uuid4().hex[:12]
        field_schemas = [
            (i, f["type"]) for i, f in zip(data_idx, schema["fields"])
        ]
        sinks: dict[object, tuple] = {}
        committed = False
        try:
            for row in rows:
                key = row[part_idx] if part_idx is not None else None
                sink = sinks.get(key)
                if sink is None:
                    subdir = (
                        os.path.join(
                            out_dir,
                            f"{partition_col}={_escape_part(key)}",
                        )
                        if part_idx is not None
                        else out_dir
                    )
                    os.makedirs(subdir, exist_ok=True)
                    path = os.path.join(
                        subdir, f"part-{task:05d}-{tag}.avro"
                    )
                    fh = open(path + ".inprogress", "wb")
                    sync = uuid.uuid4().bytes
                    fh.write(_header(schema, sync))
                    sink = (fh, sync, [], path)
                    sinks[key] = sink
                fh, sync, block, _ = sink
                block.append(encode_record(row, field_schemas))
                if len(block) >= block_records:
                    _flush_block(fh, sync, block)
            for fh, sync, block, _ in sinks.values():
                _flush_block(fh, sync, block)
            committed = True
        except BaseException:
            committed = False
            raise
        finally:
            for fh, _sync, _block, path in sinks.values():
                fh.close()
                if committed:
                    os.replace(path + ".inprogress", path)

    df.foreachPartition(write_partition)


# --------------------------------------------------------------------------
# Distributed reads: .avro container files -> DataFrame, no spark-avro.
# Files load as whole objects through Spark's binaryFile source (one
# task per file group) and decode executor-side with the pure-Python
# mirror of the encoder above — the standard pattern for a format
# Spark lacks a native reader for, and the right granularity because
# Avro containers are not splittable mid-block without an index.
# --------------------------------------------------------------------------


class _Decoder:
    """Cursor over one container file's bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.data)

    def long(self) -> int:
        shift = acc = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # un-zigzag

    def raw(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def bytes_(self) -> bytes:
        return self.raw(self.long())


def _decode_block(data: bytes, count: int, ops: list) -> list[tuple]:
    """Hot path: decode ``count`` records from one (decompressed)
    block.  Everything is inlined into one loop — varints, length
    prefixes, struct unpacks — because per-value method dispatch
    measured ~3x slower on realistic files.  ``ops`` is the compiled
    per-field plan: (union_branches | None, primitive_tag)."""
    pos = 0
    rows: list[tuple] = []
    unpack_from = struct.unpack_from
    for _ in range(count):
        vals = []
        for branches, t in ops:
            if branches is not None:
                acc = shift = 0
                while True:
                    b = data[pos]
                    pos += 1
                    acc |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                t = branches[(acc >> 1) ^ -(acc & 1)]
            if t == "null":
                vals.append(None)
            elif t == "string" or t == "bytes":
                acc = shift = 0
                while True:
                    b = data[pos]
                    pos += 1
                    acc |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                n = (acc >> 1) ^ -(acc & 1)
                raw = data[pos : pos + n]
                pos += n
                vals.append(raw.decode("utf-8") if t == "string" else raw)
            elif t == "int" or t == "long":
                acc = shift = 0
                while True:
                    b = data[pos]
                    pos += 1
                    acc |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                vals.append((acc >> 1) ^ -(acc & 1))
            elif t == "double":
                vals.append(unpack_from("<d", data, pos)[0])
                pos += 8
            elif t == "float":
                vals.append(unpack_from("<f", data, pos)[0])
                pos += 4
            elif t == "boolean":
                vals.append(data[pos] == 1)
                pos += 1
            else:
                raise ValueError(f"unsupported Avro type: {t!r}")
        rows.append(tuple(vals))
    if pos != len(data):
        raise ValueError("block under/overrun (corrupt file)")
    return rows


def _compile_ops(field_schemas: list) -> list:
    ops = []
    for s in field_schemas:
        if isinstance(s, list):
            ops.append(([_base_type(b) for b in s], None))
        else:
            ops.append((None, _base_type(s)))
    return ops


def decode_container(data: bytes) -> tuple[dict, list[tuple]]:
    """Parse one object-container file → (schema dict, record tuples).
    Supports the ``null`` and ``deflate`` codecs."""
    import zlib

    d = _Decoder(data)
    if d.raw(4) != MAGIC:
        raise ValueError("not an Avro object container (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = d.long()
        if n == 0:
            break
        if n < 0:  # negative count: abs value, preceded by ONE size long
            n = -n
            d.long()
        for _ in range(n):
            k = d.bytes_().decode("utf-8")
            meta[k] = d.bytes_()
    sync = d.raw(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec: {codec}")
    ops = _compile_ops([f["type"] for f in schema["fields"]])
    rows: list[tuple] = []
    while not d.eof():
        count = d.long()
        size = d.long()
        payload = d.raw(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        rows.extend(_decode_block(payload, count, ops))
        if d.raw(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, rows


def _spark_type(schema) -> str:
    """Avro schema fragment → Spark SQL type string (inverse of the
    inference map; logical date stays int, as to_avro_compatible
    already lowered dates)."""
    if isinstance(schema, list):
        branch = next(s for s in schema if s != "null")
        return _spark_type(branch)
    t = _base_type(schema)
    return {
        "string": "string",
        "int": "int",
        "long": "bigint",
        "float": "float",
        "double": "double",
        "boolean": "boolean",
        "bytes": "binary",
    }[t]


def read_avro_dir(
    spark,
    path: str,
    partition_col: str | None = None,
) -> DataFrame:
    """Distributed ``.avro`` scan: container files load through the
    ``binaryFile`` source (so globbing, FS abstraction, and task
    scheduling are Spark's) and decode executor-side in one Arrow
    pass.  The record schema comes from ONE file's header read
    driver-side; all files must share it (the engine's writers
    guarantee that per directory).  With ``partition_col`` the
    Hive-style directory values come back as a string column, like
    the parquet reader's partition discovery."""
    import urllib.parse

    import pandas as pd

    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    first = bf.select("content").head()
    if first is None:
        raise FileNotFoundError(f"no .avro files under {path}")
    schema, _ = decode_container(bytes(first["content"]))
    names = [f["name"] for f in schema["fields"]]
    out_fields = [
        f"`{f['name']}` {_spark_type(f['type'])}" for f in schema["fields"]
    ]
    if partition_col:
        out_fields.append(f"`{partition_col}` string")
    out_schema = ", ".join(out_fields)
    marker = f"{partition_col}=" if partition_col else None

    def decode_files(batches):
        for pdf in batches:
            out: dict[str, list] = {n: [] for n in names}
            parts: list = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                fschema, rows = decode_container(bytes(content))
                fnames = [f["name"] for f in fschema["fields"]]
                if fnames != names:
                    raise ValueError(
                        f"schema drift in {fpath}: {fnames} != {names}"
                    )
                for row in rows:
                    for n, v in zip(names, row):
                        out[n].append(v)
                if marker:
                    segs = [
                        s
                        for s in fpath.split("/")
                        if s.startswith(marker)
                    ]
                    if not segs:
                        raise ValueError(
                            f"no {marker!r} directory segment in "
                            f"{fpath!r} — file not under the expected "
                            "partition layout"
                        )
                    raw = segs[-1][len(marker):]
                    val = (
                        None
                        if raw == "__HIVE_DEFAULT_PARTITION__"
                        else urllib.parse.unquote(raw)
                    )
                    parts.extend([val] * len(rows))
            if marker:
                out[partition_col] = parts
            yield pd.DataFrame(out, columns=names + ([partition_col] if marker else []))

    return bf.select("path", "content").mapInPandas(
        decode_files, schema=out_schema
    )
