"""Embedding generation — Arrow-batched pandas UDF, pluggable model.

The reference calls Bedrock ``InvokeModel`` (titan-embed-text-v2,
default 256 dims) once per record with exponential-backoff retry
(S3VectorTargetMapper.java:100-125, VectorHelper.java:61-168).  A
per-record network call is the antithesis of 100 TB throughput; here
embedding is a vectorized ``pandas_udf`` so a real model client can
batch thousands of texts per Arrow batch, with one client per
executor (the reference's lazy-singleton pattern,
S3VectorTargetMapper.java:183-190, moved to the executor).

The default implementation is a *deterministic hash embedder* (no
model dependencies, test-stable): dims are derived from blake2b of
the text, L2-normalized.  Swap in a real encoder by registering
another ``make_embedder``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIMS = 256  # S3VectorTargetMapper.java:74


def _hash_vec(text: str, dims: int) -> np.ndarray:
    """Deterministic unit vector from text (blake2b-seeded)."""
    if text is None:
        text = ""
    out = np.empty(dims, dtype=np.float64)
    # 32 doubles per digest → ceil(dims/8) blake2b calls, each 64B.
    n_blocks = (dims * 8 + 63) // 64
    buf = b"".join(
        hashlib.blake2b(
            text.encode("utf-8", "surrogatepass"), digest_size=64,
            salt=i.to_bytes(8, "little"),
        ).digest()
        for i in range(n_blocks)
    )
    ints = np.frombuffer(buf[: dims * 8], dtype="<u8")
    # map uint64 → (-1, 1)
    out = (ints.astype(np.float64) / 2**63) - 1.0
    norm = np.linalg.norm(out)
    if norm > 0:
        out = out / norm
    return out.astype(np.float32)


def hash_embed(text_col: Column, dims: int = DEFAULT_DIMS) -> Column:
    """Deterministic embedding column (array<float>, unit-norm)."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _hash_vec(t, dims))

    return _embed(text_col)
