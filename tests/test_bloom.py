"""Bloom filter (functions/bloom.py) + dedup-index prefilter
integration: the no-false-negative guarantee, the FPR bound, the
JVM-build/numpy-probe hash agreement, and survivor equivalence with
and without the prefilter."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.functions.bloom import (
    BloomFilter,
    build_bloom,
    load_bloom,
    might_contain,
    optimal_params,
    save_bloom,
)


@pytest.fixture(scope="module")
def members(spark):
    return spark.range(5000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("key")
    )


@pytest.fixture(scope="module")
def bloom(members):
    n_bits, k = optimal_params(5000, 0.01)
    return build_bloom(members, "key", n_bits, k)


def test_no_false_negatives(spark, members, bloom):
    assert members.filter(~might_contain(F.col("key"), bloom)).count() == 0


def test_fpr_within_bound(spark, bloom):
    non = spark.range(20000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("key")
    )
    fp = non.filter(might_contain(F.col("key"), bloom)).count()
    assert fp / 20000 < 0.03  # sized for 1%; 3× headroom for variance


def test_build_partitioning_invariant(spark, members):
    n_bits, k = optimal_params(5000, 0.01)
    a = build_bloom(members.repartition(1), "key", n_bits, k)
    b = build_bloom(members.repartition(13), "key", n_bits, k)
    assert np.array_equal(a.words, b.words)


def test_probe_is_map_only(spark, members, bloom):
    plan = (
        members.select(might_contain(F.col("key"), bloom).alias("m"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_jvm_and_numpy_hashes_agree(spark, members, bloom):
    """Insert-then-probe through the two independent code paths: every
    bit the numpy probe inspects must have been set by the JVM build —
    probing immediately after building with k=1 on a huge sparse
    filter would expose any arithmetic drift as a false negative."""
    sparse = build_bloom(members, "key", n_bits=1 << 22, k=1)
    assert members.filter(~might_contain(F.col("key"), sparse)).count() == 0


def test_union_by_bitwise_or(spark):
    a_df = spark.range(100).select(F.concat(F.lit("a-"), F.col("id")).alias("key"))
    b_df = spark.range(100).select(F.concat(F.lit("b-"), F.col("id")).alias("key"))
    n_bits, k = optimal_params(200, 0.01)
    a = build_bloom(a_df, "key", n_bits, k)
    b = build_bloom(b_df, "key", n_bits, k)
    merged = BloomFilter(n_bits=n_bits, k=k, words=a.words | b.words)
    both = a_df.unionByName(b_df)
    assert both.filter(~might_contain(F.col("key"), merged)).count() == 0


def test_save_load_roundtrip(spark, bloom, tmp_path):
    save_bloom(spark, bloom, str(tmp_path / "bloom"))
    loaded = load_bloom(spark, str(tmp_path / "bloom"))
    assert loaded.n_bits == bloom.n_bits
    assert loaded.k == bloom.k
    assert np.array_equal(loaded.words, bloom.words)


def test_validation():
    with pytest.raises(ValueError):
        optimal_params(0, 0.01)
    with pytest.raises(ValueError):
        optimal_params(100, 1.5)
    with pytest.raises(ValueError):
        BloomFilter(n_bits=32, k=1, words=np.zeros(1, dtype=np.int64))
    with pytest.raises(ValueError):
        BloomFilter(n_bits=64, k=0, words=np.zeros(1, dtype=np.int64))


def test_dedup_index_prefilter_equivalence(spark, sf_dir, tmp_path):
    """The Bloom prefilter must not change dedup_against_index's
    answer — only how much of the batch reaches the join."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import (
        build_dedup_index,
        build_index_bloom,
        dedup_against_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "idx")
    build_dedup_index(corpus, path, mode="exact")
    bloom = build_index_bloom(spark, path, mode="exact")

    batch = docs.limit(200)
    plain = {r["doc_id"] for r in dedup_against_index(batch, path).collect()}
    fast = {
        r["doc_id"]
        for r in dedup_against_index(batch, path, bloom=bloom).collect()
    }
    assert fast == plain
    # and the prefilter actually suppresses joins for most fresh docs:
    # keys ruled out by the filter are exactly the definitely-fresh set
    from sample_keyspaces_cdc_streams_connectors_spark.functions.text import doc_fingerprint

    keyed = batch.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fp")
    )
    ruled_out = keyed.filter(~might_contain(F.col("fp"), bloom)).count()
    n_fresh = len(plain)
    assert ruled_out > 0
    assert ruled_out <= n_fresh


# ---------------------------------------------------------------- bucketed


@pytest.fixture(scope="module")
def bucketed_members(spark):
    """Keys with a derived bucket in [0, 16) — the dedup-index shape
    (hex-prefix bucketing) reduced to 16 buckets for test speed."""
    return spark.range(4000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("key"),
        (F.col("id") % 16).cast("int").alias("bucket"),
    )


@pytest.fixture(scope="module")
def bucketed_bloom(bucketed_members):
    from sample_keyspaces_cdc_streams_connectors_spark.functions.bloom import build_bloom_bucketed

    n_bits, k = optimal_params(4000 // 16, 0.01)
    return build_bloom_bucketed(
        bucketed_members, "key", F.col("bucket"), n_bits, k, n_buckets=16
    )


def test_bucketed_no_false_negatives(spark, bucketed_members, bucketed_bloom):
    from sample_keyspaces_cdc_streams_connectors_spark.functions.bloom import might_contain_bucketed

    assert (
        bucketed_members.filter(
            ~might_contain_bucketed(
                F.col("bucket"), F.col("key"), bucketed_bloom
            )
        ).count()
        == 0
    )


def test_bucketed_fpr_and_bucket_isolation(spark, bucketed_members, bucketed_bloom):
    """A member key probed against the WRONG bucket behaves like a
    non-member (the per-bucket filters are independent), and fresh
    keys stay under the sized FPR with headroom."""
    from sample_keyspaces_cdc_streams_connectors_spark.functions.bloom import might_contain_bucketed

    wrong = bucketed_members.select(
        "key", ((F.col("bucket") + 1) % 16).alias("bucket")
    )
    hits_wrong = wrong.filter(
        might_contain_bucketed(F.col("bucket"), F.col("key"), bucketed_bloom)
    ).count()
    assert hits_wrong / 4000 < 0.03
    fresh = spark.range(20000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("key"),
        (F.col("id") % 16).cast("int").alias("bucket"),
    )
    fp = fresh.filter(
        might_contain_bucketed(F.col("bucket"), F.col("key"), bucketed_bloom)
    ).count()
    assert fp / 20000 < 0.03


def test_bucketed_union_bit_identical_to_rebuild(spark):
    """bloom_union(A, B) must equal a single build over A ∪ B bit for
    bit — the property that makes per-bucket APPEND exact."""
    from sample_keyspaces_cdc_streams_connectors_spark.functions.bloom import (
        bloom_union,
        build_bloom_bucketed,
    )

    def keys(prefix, n):
        return spark.range(n).select(
            F.concat(F.lit(prefix), F.col("id")).alias("key"),
            (F.col("id") % 4).cast("int").alias("bucket"),
        )

    a_df, b_df = keys("a-", 300), keys("b-", 300)
    n_bits, k = optimal_params(150, 0.01)
    a = build_bloom_bucketed(a_df, "key", F.col("bucket"), n_bits, k, n_buckets=4)
    b = build_bloom_bucketed(b_df, "key", F.col("bucket"), n_bits, k, n_buckets=4)
    rebuilt = build_bloom_bucketed(
        a_df.unionByName(b_df), "key", F.col("bucket"), n_bits, k, n_buckets=4
    )
    assert np.array_equal(bloom_union(a, b).words, rebuilt.words)


def test_bucketed_build_is_one_shuffle_not_per_bucket(spark, bucketed_members):
    """The build's job structure must be bucket-count-independent:
    flat and bucketed builds over the same keys run the same number
    of jobs (ONE groupBy shuffle, never a job per bucket)."""
    from sample_keyspaces_cdc_streams_connectors_spark.functions.bloom import build_bloom_bucketed

    n_bits, k = optimal_params(250, 0.01)
    tracker = spark.sparkContext.statusTracker()

    def jobs_for(fn):
        before = len(tracker.getJobIdsForGroup(None) or [])
        fn()
        return len(tracker.getJobIdsForGroup(None) or []) - before

    flat_jobs = jobs_for(
        lambda: build_bloom(bucketed_members, "key", n_bits, k)
    )
    bucketed_jobs = jobs_for(
        lambda: build_bloom_bucketed(
            bucketed_members, "key", F.col("bucket"), n_bits, k, n_buckets=16
        )
    )
    assert bucketed_jobs == flat_jobs


def test_bucketed_save_load_roundtrip(spark, bucketed_bloom, tmp_path):
    from sample_keyspaces_cdc_streams_connectors_spark.functions.bloom import (
        load_bloom_bucketed,
        save_bloom_bucketed,
    )

    save_bloom_bucketed(spark, bucketed_bloom, str(tmp_path / "bb"))
    loaded = load_bloom_bucketed(spark, str(tmp_path / "bb"))
    assert loaded.n_bits == bucketed_bloom.n_bits
    assert loaded.k == bucketed_bloom.k
    assert np.array_equal(loaded.words, bucketed_bloom.words)
    # the on-disk layout is partitionBy(bucket): bucket directories
    # exist, so a bucket-scoped reader opens only what it needs
    import os

    names = set(os.listdir(tmp_path / "bb" / "words"))
    assert any(n.startswith("bucket=") for n in names)


def test_bucketed_null_bucket_raises_value_error(spark):
    from sample_keyspaces_cdc_streams_connectors_spark.functions.bloom import build_bloom_bucketed

    df = spark.createDataFrame(
        [("k1", 0), ("k2", None)], "key string, bucket int"
    )
    with pytest.raises(ValueError, match="bucket_idx produced"):
        build_bloom_bucketed(df, "key", F.col("bucket"), 256, 2, n_buckets=4)


def test_bucketed_validation():
    from sample_keyspaces_cdc_streams_connectors_spark.functions.bloom import (
        BucketedBloomFilter,
        bloom_union,
    )

    with pytest.raises(ValueError, match="words must be"):
        BucketedBloomFilter(
            n_bits=128, k=2, words=np.zeros((4, 1), dtype=np.int64)
        )
    a = BucketedBloomFilter(n_bits=128, k=2, words=np.zeros((4, 2), dtype=np.int64))
    flat = BloomFilter(n_bits=128, k=2, words=np.zeros(2, dtype=np.int64))
    with pytest.raises(ValueError, match="cannot union"):
        bloom_union(a, flat)
    b = BucketedBloomFilter(n_bits=128, k=2, words=np.zeros((8, 2), dtype=np.int64))
    with pytest.raises(ValueError, match="parameter mismatch"):
        bloom_union(a, b)


def test_dedup_index_bucketed_bloom_equivalence(spark, sf_dir, tmp_path):
    """build_index_bloom(bucketed=True) routes the dedup-index probe
    through per-bucket filters — survivors must equal the plain join
    AND the flat-Bloom arm (no false negatives per bucket), and the
    set round-trips through the partitionBy(bucket) persistence."""
    from sample_keyspaces_cdc_streams_connectors_spark.functions.bloom import (
        load_bloom_bucketed,
        save_bloom_bucketed,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import (
        build_dedup_index,
        build_index_bloom,
        dedup_against_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "idx")
    build_dedup_index(corpus, path, mode="exact")
    flat = build_index_bloom(spark, path, mode="exact")
    bucketed = build_index_bloom(spark, path, mode="exact", bucketed=True)

    batch = docs.limit(200)
    plain = {r["doc_id"] for r in dedup_against_index(batch, path).collect()}
    via_flat = {
        r["doc_id"]
        for r in dedup_against_index(batch, path, bloom=flat).collect()
    }
    via_bucketed = {
        r["doc_id"]
        for r in dedup_against_index(batch, path, bloom=bucketed).collect()
    }
    assert via_bucketed == via_flat == plain

    bb_path = str(tmp_path / "bb")
    save_bloom_bucketed(spark, bucketed, bb_path)
    loaded = load_bloom_bucketed(spark, bb_path)
    via_loaded = {
        r["doc_id"]
        for r in dedup_against_index(batch, path, bloom=loaded).collect()
    }
    assert via_loaded == plain
