"""DSIR importance resampling: n-gram profile correctness, ratio-model
ranking, deterministic Gumbel top-k, and the map-only scoring plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.importance import (
    fit_importance_model,
    gumbel_resample_top_k,
    hashed_ngram_buckets,
    importance_log_weights,
    ngram_bucket_counts,
    select_like_target,
)

PROSE = [
    "the quick brown fox jumps over the lazy dog by the river",
    "it was a bright cold day in april and the clocks struck one",
    "many years later the colonel remembered that distant afternoon",
    "a clean well lighted place with honest prose and clear thought",
]
SPAM = [
    "click here buy now free offer click here buy now",
    "win win win prize prize casino casino jackpot now",
    "cheap deals deals now now subscribe subscribe free",
    "lottery winner claim claim now casino bonus bonus",
]


@pytest.fixture(scope="module")
def raw(spark):
    rows = [(i, t) for i, t in enumerate(PROSE + SPAM)]
    return spark.createDataFrame(rows, "doc_id int, text string").cache()


@pytest.fixture(scope="module")
def target(spark):
    # target distribution: prose-like exemplars (disjoint from raw)
    rows = [
        (0, "the fox and the dog walked by the cold river in april"),
        (1, "the colonel read honest prose with clear thought that day"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string").cache()


def test_ngram_feature_count(spark):
    # n tokens -> n unigrams + (n-1) bigrams
    df = spark.createDataFrame([(1, "a b c d")], "doc_id int, text string")
    n = df.select(
        F.size(hashed_ngram_buckets(F.col("text"), 1024)).alias("n")
    ).collect()[0]["n"]
    assert n == 4 + 3
    # single-token and empty docs don't error
    edge = spark.createDataFrame(
        [(1, "solo"), (2, "")], "doc_id int, text string"
    )
    sizes = {
        r["doc_id"]: r["n"]
        for r in edge.select(
            "doc_id",
            F.size(hashed_ngram_buckets(F.col("text"), 1024)).alias("n"),
        ).collect()
    }
    assert sizes == {1: 1, 2: 0}


def test_bucket_counts_sum_to_total_grams(spark, raw):
    total = sum(len(t.split()) * 2 - 1 for t in PROSE + SPAM)
    counted = (
        ngram_bucket_counts(raw, n_buckets=1 << 14)
        .agg(F.sum("cnt"))
        .collect()[0][0]
    )
    assert counted == total


def test_ratio_model_ranks_target_like_docs_higher(raw, target):
    model = fit_importance_model(target, raw, n_buckets=1 << 14)
    rows = importance_log_weights(raw, model).collect()
    prose_w = [r["log_importance"] for r in rows if r["doc_id"] < len(PROSE)]
    spam_w = [r["log_importance"] for r in rows if r["doc_id"] >= len(PROSE)]
    assert min(prose_w) > max(spam_w)


def test_select_like_target_prefers_prose(raw, target):
    chosen = select_like_target(raw, target, k=4, n_buckets=1 << 14)
    ids = sorted(r["doc_id"] for r in chosen.select("doc_id").collect())
    assert len(ids) == 4
    # at least 3 of the 4 picks are prose (Gumbel noise may admit one)
    assert sum(1 for i in ids if i < len(PROSE)) >= 3


def test_gumbel_resample_deterministic_and_salted(spark, raw, target):
    model = fit_importance_model(target, raw, n_buckets=1 << 14)
    weighted = importance_log_weights(raw, model).cache()
    a = sorted(
        r["doc_id"]
        for r in gumbel_resample_top_k(weighted, 3).select("doc_id").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in gumbel_resample_top_k(
            weighted.repartition(7), 3
        ).select("doc_id").collect()
    )
    assert a == b  # partition-invariant, reproducible
    plan = (
        gumbel_resample_top_k(weighted, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # heap top-k, no global sort
    weighted.unpersist()


def test_weight_plan_is_map_only(spark, sf_dir, raw, target):
    model = fit_importance_model(target, raw, n_buckets=1 << 14)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        importance_log_weights(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_staged_cache_carries_no_text(spark, raw):
    """The frame select_like_target persists is exactly
    (id, __buckets) — the corpus text must never enter storage."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.importance import _staged_buckets

    staged = _staged_buckets(raw, "text", "doc_id", 1 << 14)
    assert staged.columns == ["doc_id", "__buckets"]
    # and the full pipeline releases the staged cache: the only NEW
    # persisted RDD after the call is the k-row localCheckpoint of
    # the RESULT (module fixtures keep their own caches)
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    select_like_target(raw, raw.limit(2), k=3, n_buckets=1 << 14).count()
    assert jsc.getPersistentRDDs().size() <= before + 1


def test_threshold_selection_equals_exact_top_k(raw, target):
    """exact_limit=0 forces the approx-quantile threshold path; the
    selected set must be IDENTICAL to the per-partition heap path
    (the threshold is a prefilter, not an approximation)."""
    exact = select_like_target(raw, target, k=4, n_buckets=1 << 14)
    thresh = select_like_target(
        raw, target, k=4, n_buckets=1 << 14, exact_limit=0
    )
    e = {r["doc_id"] for r in exact.select("doc_id").collect()}
    t = {r["doc_id"] for r in thresh.select("doc_id").collect()}
    assert e == t and len(e) == 4
    # schema contract unchanged: raw columns + log_importance
    assert thresh.columns == raw.columns + ["log_importance"]


def test_threshold_path_k_exceeding_n(raw, target):
    n = raw.count()
    got = select_like_target(
        raw, target, k=n + 5, n_buckets=1 << 14, exact_limit=0
    )
    assert got.count() == n


def test_threshold_path_with_null_weights_matches_exact(spark):
    """NULL weights sort last under the exact heap; the threshold
    prefilter ignores nulls in approxQuantile, so it must fall back
    whenever non-null rows alone cannot fill k — including the
    all-null corner (approxQuantile returns no cut at all)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.importance import gumbel_resample_top_k

    rows = [(i, float(i) if i % 3 == 0 else None) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, log_importance double")
    k = 40  # > 20 non-null rows: prefilter cannot fill k
    exact = {
        r.doc_id
        for r in gumbel_resample_top_k(df, k, exact_limit=10**9).collect()
    }
    thresh = {
        r.doc_id
        for r in gumbel_resample_top_k(df, k, exact_limit=0).collect()
    }
    assert thresh == exact and len(exact) == k

    all_null = spark.createDataFrame(
        [(i, None) for i in range(20)], "doc_id long, log_importance double"
    )
    got = gumbel_resample_top_k(all_null, 5, exact_limit=0)
    assert got.count() == 5  # no crash, exact fallback fills k
