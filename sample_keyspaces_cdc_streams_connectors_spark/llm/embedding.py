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
    """Deterministic unit vector from text: one blake2b digest seeds a
    PCG64 stream that fills all dims (vectorized — no per-dim
    hashing)."""
    if text is None:
        text = ""
    digest = hashlib.blake2b(
        text.encode("utf-8", "surrogatepass"), digest_size=16
    ).digest()
    rng = np.random.Generator(
        np.random.PCG64(int.from_bytes(digest, "little"))
    )
    out = rng.standard_normal(dims)
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
