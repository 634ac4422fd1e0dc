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
