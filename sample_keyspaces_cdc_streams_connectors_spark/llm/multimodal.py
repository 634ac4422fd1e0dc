"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: media is carried as an opaque ``binary`` column next to a
typed metadata struct (the reference's S3 Vectors metadata document
pattern, S3VectorTargetMapper.java:134-162, generalized).  Heavy
per-item work (decode, resize, frame-sample, feature-extract) runs in
``mapInPandas`` — Arrow batches in, Arrow batches out, one Python
worker per core, no driver involvement.  Batch size is bounded via
``spark.sql.execution.arrow.maxRecordsPerBatch`` so decoded frames
fit executor memory.

The actual codecs (Pillow / ffmpeg / torchaudio) are NOT available in
this container, so ``decode_image`` is STUBBED: the real entry point
raises ``NotImplementedError`` unless the deterministic fake decoder
is selected.  The Spark-side plumbing — schema, UDF signature, Arrow
batching, partition behavior — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal schema fragment: payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_n_bytes", LongType(), True),
        StructField("meta_digest", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("digest", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def synthesize_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from `documents`: payload =
    utf-8 bytes of the text (stands in for encoded image bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder: derives a plausible
    (width, height) from payload length. Replace with PIL at deploy."""
    n = len(payload or b"")
    return (64 + n % 512, 64 + (n // 7) % 512)


def decode_image(payload: bytes, *, fake: bool = False) -> tuple[int, int]:
    """Real decoder entry point — stubbed in this environment."""
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "image codecs not available in this container; pass fake=True "
        "or plug a real decoder into extract_features"
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over the payload column.

    Arrow-batched: each pandas chunk holds many rows; per-row Python
    work is only the (stubbed) decode.  Output is a flat typed frame
    matching FEATURE_SCHEMA.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = payloads.map(lambda p: decode_image(p, fake=fake))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(
                        lambda p: len(p or b"")
                    ).astype("int64"),
                    "digest": payloads.map(
                        lambda p: hashlib.md5(p or b"").hexdigest()
                    ),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
