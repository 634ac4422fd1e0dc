"""Distributed Bloom filter build + vectorized membership probe.

Scale role: the cross-corpus dedup index (``llm/dedup_index.py``)
suppresses previously-seen documents with a keys-only anti-join.  At
100 TB streaming ingest that is one stream-static join per
micro-batch against a billions-of-keys index — correct, but every
batch pays the probe even though almost all documents are fresh.  A
Bloom prefilter inverts the cost: a *definitely-not-present* answer
(the common case) is a map-only bitset lookup, and only the tiny
might-be-present remainder reaches the join.  False positives cost a
redundant join probe; false negatives are impossible, so exactness
is preserved (equivalence-pinned in tests/test_bloom.py).

Construction is Spark-native and deterministic:

- each key hashes to k positions via Kirsch-Mitzenmacher double
  hashing (two 60-bit slices of the key's md5) — the position
  arithmetic is written in *reduced form* ``(h1m + i*h2m) % n_bits``
  with both operands pre-reduced mod ``n_bits``, so it never
  overflows int64 (ANSI-safe) and the JVM build and the numpy probe
  compute bit-identical positions;
- the bitset is built distributed: positions explode (map-only),
  ``groupBy(word)`` ORs per-64-bit-word masks with ONE
  map-side-combined shuffle of at most ``n_bits/64`` keys, and only
  the packed words collect to the driver;
- the probe broadcasts the packed array into an Arrow ``pandas_udf``
  over JVM-computed (h1, h2) columns — all integer numpy math, no
  per-row python hashing.

Memory: 10⁸ keys at 1% FPR ≈ 120 MB — broadcastable.  Beyond that,
:class:`BucketedBloomFilter` keeps one filter per index prefix-bucket
(the index is already 256-bucketed): the build stays ONE shuffle
(bucket joins the groupBy key), the probe routes each key to its
bucket's bitset with pure numpy indexing (one extra int column), and
the per-bucket layout is what lets the structure keep scaling — the
bitsets save ``partitionBy(bucket)``, so a probe task needs only the
buckets it actually sees, and appends union in per bucket (Bloom
filters union by bitwise OR, :func:`bloom_union`) without touching
the other 255.  At the 10¹¹-key standing-index regime the full
filter set no longer fits one task; the save layout is
deliberately the cogroup-ready shape (batch bucket ↔ filter bucket)
for that step.

No reference counterpart (the reference has no membership structure
at all); Spark's own ``DataFrameStatFunctions.bloomFilter`` builds
driver-side and cannot be probed from a Column expression, which is
why this exists.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "BloomFilter",
    "BucketedBloomFilter",
    "optimal_params",
    "build_bloom",
    "build_bloom_bucketed",
    "might_contain",
    "might_contain_bucketed",
    "bloom_union",
    "save_bloom",
    "load_bloom",
    "save_bloom_bucketed",
    "load_bloom_bucketed",
]


@dataclass(frozen=True)
class BloomFilter:
    n_bits: int
    k: int
    words: np.ndarray  # int64[ceil(n_bits/64)], packed little-endian bits

    def __post_init__(self) -> None:
        if self.n_bits < 64:
            raise ValueError(f"n_bits must be >= 64, got {self.n_bits}")
        if not 1 <= self.k <= 32:
            raise ValueError(f"k must be in [1, 32], got {self.k}")


def optimal_params(n_items: int, fpr: float) -> tuple[int, int]:
    """Classic sizing: bits = -n·ln(p)/ln2², k = bits/n·ln2 (both
    clamped to sane minimums; bits rounded up to a word multiple)."""
    if n_items < 1:
        raise ValueError(f"n_items must be >= 1, got {n_items}")
    if not 0.0 < fpr < 1.0:
        raise ValueError(f"fpr must be in (0,1), got {fpr}")
    n_bits = max(64, int(math.ceil(-n_items * math.log(fpr) / (math.log(2) ** 2))))
    n_bits = ((n_bits + 63) // 64) * 64
    k = max(1, min(32, round(n_bits / n_items * math.log(2))))
    return n_bits, int(k)


def _hash_cols(col: Column) -> tuple[Column, Column]:
    """Two independent 60-bit integers from one md5 — identical
    construction on the probe side in numpy."""
    h = F.md5(col.cast("string"))
    h1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 17, 15), 16, 10).cast("long")
    return h1, h2


def build_bloom(
    df: DataFrame, col: str, n_bits: int, k: int
) -> BloomFilter:
    """Distributed build: ONE shuffle of at most ``n_bits/64``
    (word-index, mask) keys; the collected result is the packed
    bitset only, never the keys."""
    # validate via the dataclass contract before any job runs
    probe = BloomFilter(n_bits=n_bits, k=k, words=np.zeros(1, dtype=np.int64))
    del probe
    h1, h2 = _hash_cols(F.col(col))
    h1m = h1 % n_bits
    h2m = (h2 % n_bits) * 2 + 1  # odd step; < 2*n_bits, no overflow
    words = (
        df.select(h1m.alias("_h1m"), h2m.alias("_h2m"))
        .withColumn("_i", F.explode(F.lit(list(range(k)))))
        .select(
            ((F.col("_h1m") + F.col("_i") * F.col("_h2m")) % n_bits).alias(
                "_pos"
            )
        )
        .select(
            F.expr("_pos div 64").alias("_w"),
            F.expr("shiftleft(1L, cast(_pos % 64 as int))").alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_bits"))
        .collect()
    )
    packed = np.zeros((n_bits + 63) // 64, dtype=np.int64)
    for r in words:
        packed[r["_w"]] = r["_bits"]
    return BloomFilter(n_bits=n_bits, k=k, words=packed)


def might_contain(col: Column, bloom: BloomFilter) -> Column:
    """Vectorized membership probe — ``false`` means DEFINITELY not
    inserted; ``true`` means present or a false positive.  Map-only:
    the bitset rides the task closure; the UDF does pure numpy
    integer math over JVM-computed hash columns."""
    n_bits, k = bloom.n_bits, bloom.k
    words = bloom.words.view(np.uint64)
    import pandas as pd

    # no inline type hints (module uses `from __future__ import
    # annotations`; pandas_udf can't resolve the stringified form)
    def probe(h1s, h2s):
        h1m = h1s.to_numpy(dtype=np.int64) % n_bits
        h2m = (h2s.to_numpy(dtype=np.int64) % n_bits) * 2 + 1
        steps = np.arange(k, dtype=np.int64)[None, :]
        pos = (h1m[:, None] + steps * h2m[:, None]) % n_bits
        pos = pos.astype(np.uint64)
        hits = (words[pos >> np.uint64(6)] >> (pos & np.uint64(63))) & np.uint64(1)
        return pd.Series(hits.all(axis=1))

    udf = F.pandas_udf(probe, "boolean")
    h1, h2 = _hash_cols(col)
    return udf(h1, h2)


@dataclass(frozen=True)
class BucketedBloomFilter:
    """One Bloom filter per index prefix-bucket, stacked as a 2D
    bitset — the scale form of :class:`BloomFilter` for bucketed key
    indexes (``llm.dedup_index`` keeps 256 ``bucket=XX`` directories).
    ``n_bits``/``k`` are PER BUCKET; ``words`` is
    ``(n_buckets, n_bits/64)`` packed int64."""

    n_bits: int
    k: int
    words: np.ndarray

    def __post_init__(self) -> None:
        if self.n_bits < 64:
            raise ValueError(f"n_bits must be >= 64, got {self.n_bits}")
        if not 1 <= self.k <= 32:
            raise ValueError(f"k must be in [1, 32], got {self.k}")
        if self.words.ndim != 2 or self.words.shape[1] != self.n_bits // 64:
            raise ValueError(
                f"words must be (n_buckets, {self.n_bits // 64}), "
                f"got {self.words.shape}"
            )

    @property
    def n_buckets(self) -> int:
        return int(self.words.shape[0])


def build_bloom_bucketed(
    df: DataFrame,
    col: str,
    bucket_idx: Column,
    n_bits: int,
    k: int,
    n_buckets: int = 256,
) -> BucketedBloomFilter:
    """Distributed build of ALL per-bucket filters in ONE shuffle:
    the bucket index simply joins the word-index groupBy key, so the
    job count and the shuffle volume are identical to the flat build
    — never a job per bucket.  ``bucket_idx`` must evaluate to an int
    in ``[0, n_buckets)`` (e.g. the hex prefix the index partitions
    by, ``conv(substring(fp, 1, 2), 16, 10)``)."""
    probe = BucketedBloomFilter(
        n_bits=n_bits,
        k=k,
        words=np.zeros((n_buckets, n_bits // 64), dtype=np.int64),
    )
    h1, h2 = _hash_cols(F.col(col))
    h1m = h1 % n_bits
    h2m = (h2 % n_bits) * 2 + 1
    rows = (
        df.select(
            bucket_idx.cast("int").alias("_b"),
            h1m.alias("_h1m"),
            h2m.alias("_h2m"),
        )
        .withColumn("_i", F.explode(F.lit(list(range(k)))))
        .select(
            "_b",
            ((F.col("_h1m") + F.col("_i") * F.col("_h2m")) % n_bits).alias(
                "_pos"
            ),
        )
        .select(
            "_b",
            F.expr("_pos div 64").alias("_w"),
            F.expr("shiftleft(1L, cast(_pos % 64 as int))").alias("_m"),
        )
        .groupBy("_b", "_w")
        .agg(F.bit_or("_m").alias("_bits"))
        .collect()
    )
    packed = probe.words  # zeros, correctly shaped
    for r in rows:
        b = r["_b"]
        if b is None or not 0 <= b < n_buckets:
            raise ValueError(
                f"bucket_idx produced {b!r}, outside [0, {n_buckets}) "
                "(NULL means the bucket expression or key column was null)"
            )
        packed[b, r["_w"]] = r["_bits"]
    return probe


def might_contain_bucketed(
    bucket_idx: Column, col: Column, bloom: BucketedBloomFilter
) -> Column:
    """Bucket-routed membership probe: each key tests against ITS
    bucket's bitset only — same map-only Arrow shape as
    :func:`might_contain`, one extra int column for the routing, the
    2D bitset indexed ``words[bucket, word]`` in pure numpy."""
    n_bits, k = bloom.n_bits, bloom.k
    words2d = bloom.words.view(np.uint64)
    n_buckets = bloom.n_buckets
    import pandas as pd

    def probe(bs, h1s, h2s):
        b = bs.to_numpy(dtype=np.int64)
        if len(b) and (b.min() < 0 or b.max() >= n_buckets):
            raise ValueError(
                f"bucket index outside [0, {n_buckets}): "
                f"[{b.min()}, {b.max()}]"
            )
        h1m = h1s.to_numpy(dtype=np.int64) % n_bits
        h2m = (h2s.to_numpy(dtype=np.int64) % n_bits) * 2 + 1
        steps = np.arange(k, dtype=np.int64)[None, :]
        pos = ((h1m[:, None] + steps * h2m[:, None]) % n_bits).astype(
            np.uint64
        )
        hits = (
            words2d[b[:, None], (pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return pd.Series(hits.all(axis=1))

    udf = F.pandas_udf(probe, "boolean")
    h1, h2 = _hash_cols(col)
    return udf(bucket_idx.cast("int"), h1, h2)


def bloom_union(a, b):
    """Bitwise-OR union — for both flat and bucketed filters.  The
    union of two filters built with the SAME parameters over key sets
    A and B is bit-identical to one filter built over A ∪ B (each
    key's positions depend only on the key and the parameters), which
    is what makes per-bucket APPEND semantics exact: OR the appended
    keys' filter in, never rebuild the other buckets."""
    if type(a) is not type(b):
        raise ValueError(f"cannot union {type(a).__name__} with {type(b).__name__}")
    if (a.n_bits, a.k) != (b.n_bits, b.k) or a.words.shape != b.words.shape:
        raise ValueError(
            f"parameter mismatch: ({a.n_bits}, {a.k}, {a.words.shape}) "
            f"vs ({b.n_bits}, {b.k}, {b.words.shape})"
        )
    return type(a)(n_bits=a.n_bits, k=a.k, words=a.words | b.words)


def save_bloom(spark: SparkSession, bloom: BloomFilter, path: str) -> None:
    """Persist as parquet of (word_idx, bits) non-zero words plus a
    meta row — written THROUGH Spark (object-store-safe)."""
    nz = np.flatnonzero(bloom.words)
    rows = [(int(i), int(bloom.words[i])) for i in nz]
    spark.createDataFrame(
        rows or [(-1, 0)], "word_idx long, bits long"
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/words")
    spark.createDataFrame(
        [(bloom.n_bits, bloom.k)], "n_bits long, k int"
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_bloom(spark: SparkSession, path: str) -> BloomFilter:
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    packed = np.zeros((int(meta["n_bits"]) + 63) // 64, dtype=np.int64)
    for r in spark.read.parquet(f"{path}/words").collect():
        if r["word_idx"] >= 0:
            packed[r["word_idx"]] = r["bits"]
    return BloomFilter(
        n_bits=int(meta["n_bits"]), k=int(meta["k"]), words=packed
    )


def save_bloom_bucketed(
    spark: SparkSession, bloom: BucketedBloomFilter, path: str
) -> None:
    """Persist the per-bucket filter set as parquet of non-zero
    (bucket, word_idx, bits) rows, ``partitionBy(bucket)`` — so a
    future bucket-scoped reader (or a cogroup of batch bucket ↔
    filter bucket) opens ONLY the bucket directories it needs, and a
    per-bucket append can overwrite one ``bucket=XX`` directory via
    dynamic partition overwrite without touching the other 255."""
    bs, ws = np.nonzero(bloom.words)
    rows = [
        (int(b), int(w), int(bloom.words[b, w])) for b, w in zip(bs, ws)
    ]
    (
        spark.createDataFrame(
            rows or [(-1, -1, 0)], "bucket int, word_idx long, bits long"
        )
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/words")
    )
    spark.createDataFrame(
        [(bloom.n_bits, bloom.k, bloom.n_buckets)],
        "n_bits long, k int, n_buckets int",
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_bloom_bucketed(spark: SparkSession, path: str) -> BucketedBloomFilter:
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    n_bits, k = int(meta["n_bits"]), int(meta["k"])
    packed = np.zeros(
        (int(meta["n_buckets"]), n_bits // 64), dtype=np.int64
    )
    for r in spark.read.parquet(f"{path}/words").collect():
        if r["bucket"] >= 0:
            packed[r["bucket"], r["word_idx"]] = r["bits"]
    return BucketedBloomFilter(n_bits=n_bits, k=k, words=packed)
