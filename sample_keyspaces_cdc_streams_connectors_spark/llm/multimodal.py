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


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), True),
        StructField("frame_bytes", LongType(), True),
        StructField("frame_digest", StringType(), True),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("out_width", IntegerType(), True),
        StructField("out_height", IntegerType(), True),
        StructField("out_payload", BinaryType(), True),
    ]
)


def sample_frames(
    media: DataFrame,
    frame_chars: int = 64,
    max_frames: int = 4,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling over video-like payloads: one output row per
    sampled frame (mapInPandas — rows out ≠ rows in, which a
    pandas_udf can't express).

    The real path would seek+decode keyframes via ffmpeg (stubbed —
    NotImplementedError unless fake=True); the fake deterministic
    decoder treats the payload as a UTF-8 reel and cuts fixed-size
    chunks, so frame count/size/digest are oracle-checkable.

    Scale: frames multiply rows by ≤max_frames but stay inside the
    Arrow batch — no shuffle; downstream per-frame work sees a flat
    typed frame."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in FRAME_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "video codecs not available in this container; "
                        "pass fake=True or plug a real frame decoder"
                    )
                reel = (payload or b"").decode("utf-8", "replace")
                for k in range(max_frames):
                    chunk = reel[k * frame_chars : (k + 1) * frame_chars]
                    if not chunk:
                        break
                    raw = chunk.encode("utf-8")
                    out["media_id"].append(mid)
                    out["frame_idx"].append(k)
                    out["frame_payload"].append(raw)
                    out["frame_bytes"].append(len(raw))
                    out["frame_digest"].append(hashlib.md5(raw).hexdigest())
            yield pd.DataFrame(out).astype(
                {"media_id": "int64", "frame_idx": "int32", "frame_bytes": "int64"}
            ) if out["media_id"] else pd.DataFrame(
                {
                    "media_id": pd.Series(dtype="int64"),
                    "frame_idx": pd.Series(dtype="int32"),
                    "frame_payload": pd.Series(dtype=object),
                    "frame_bytes": pd.Series(dtype="int64"),
                    "frame_digest": pd.Series(dtype=object),
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def resize_images(
    media: DataFrame, max_side: int = 224, fake: bool = True
) -> DataFrame:
    """Bounded-box resize: scale (width, height) so the longer side is
    ≤ max_side, preserving aspect ratio with integer floor arithmetic
    (so the transform is exactly reproducible in SQL).

    Real path = decode + PIL thumbnail (stubbed); the fake path derives
    dims from the fake decoder and truncates the payload to the scaled
    pixel budget — binary-out plumbing stays real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, ow, oh, op = [], [], [], [], []
            for payload in pdf["payload"]:
                w, h = decode_image(payload, fake=fake)
                m = max(w, h)
                if m > max_side:
                    w2, h2 = (w * max_side) // m, (h * max_side) // m
                else:
                    w2, h2 = w, h
                widths.append(w)
                heights.append(h)
                ow.append(w2)
                oh.append(h2)
                op.append((payload or b"")[: w2 * h2])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "out_width": pd.Series(ow, dtype="int32"),
                    "out_height": pd.Series(oh, dtype="int32"),
                    "out_payload": pd.Series(op, dtype=object),
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


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
