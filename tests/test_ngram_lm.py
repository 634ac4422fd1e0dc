"""Stupid-Backoff n-gram LM (llm/ngram_lm.py): end-to-end equivalence
with a sequential reference (training counts via JVM hashing, scoring
via hashlib — the hash-agreement contract), fluency discrimination,
the map-only score plan, and the pipeline stage."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.config import load_config
from sample_keyspaces_cdc_streams_connectors_spark.llm.ngram_lm import (
    NgramLm,
    lm_perplexity,
    load_ngram_lm,
    save_ngram_lm,
    score_lm,
    train_ngram_lm,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown cat sleeps on the warm mat",
    "a quick brown fox runs over the green hill",
    "the lazy dog sleeps on the mat all day",
]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _reference_model(texts):
    """Independent trainer: plain Counters over the same hashing."""
    uni, bi = Counter(), Counter()
    total = 0
    for t in texts:
        ws = t.lower().split()
        hs = [_h60(w) for w in ws]
        total += len(hs)
        uni.update(hs)
        bi.update(_h60(f"{a}:{b}") for a, b in zip(hs, hs[1:]))
    return dict(uni), dict(bi), total


def _reference_score(text, uni, bi, total, alpha=0.4):
    ws = text.lower().split()
    hs = [_h60(w) for w in ws]
    oov = 1.0 / (10.0 * total)
    lp, prev = 0.0, None
    for h in hs:
        s = None
        if prev is not None:
            cb = bi.get(_h60(f"{prev}:{h}"))
            if cb is not None and uni.get(prev):
                s = cb / uni[prev]
        if s is None:
            base = uni.get(h, 0) / total if uni.get(h) else oov
            s = base if prev is None else alpha * base
        lp += math.log10(s)
        prev = h
    return lp / len(hs)


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )


@pytest.fixture(scope="module")
def model(corpus_df):
    return train_ngram_lm(corpus_df, max_entries=10_000)


def test_training_matches_reference_counts(model):
    uni, bi, total = _reference_model(CORPUS)
    assert model.total_tokens == total
    assert model.unigrams == uni
    assert model.bigrams == bi


def test_scoring_matches_sequential_reference(spark, corpus_df, model):
    uni, bi, total = _reference_model(CORPUS)
    rows = corpus_df.select(
        "text", score_lm(F.col("text"), model).alias("s")
    ).collect()
    for r in rows:
        assert r["s"] == pytest.approx(
            _reference_score(r["text"], uni, bi, total), rel=1e-12
        )


def test_training_partitioning_invariant(spark, corpus_df):
    a = train_ngram_lm(corpus_df.repartition(1))
    b = train_ngram_lm(corpus_df.repartition(7))
    assert (a.unigrams, a.bigrams, a.total_tokens) == (
        b.unigrams,
        b.bigrams,
        b.total_tokens,
    )


def test_fluency_discriminates(spark, model):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "zxqv wkjh plmq vvxz qqq jjjj wxyz mmmm kkkk"),
        ],
        "doc_id int, text string",
    )
    ppl = {
        r["doc_id"]: r["p"]
        for r in df.select(
            "doc_id", lm_perplexity(F.col("text"), model).alias("p")
        ).collect()
    }
    assert ppl[1] * 100 < ppl[2]


def test_null_and_empty_text(spark, model):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "doc_id int, text string"
    )
    rows = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", score_lm(F.col("text"), model).alias("s")
        ).collect()
    }
    assert rows == {1: None, 2: None, 3: None}


def test_capped_table_backs_off_gracefully(spark, corpus_df):
    tiny = train_ngram_lm(corpus_df, max_entries=5)
    assert len(tiny.unigrams) + len(tiny.bigrams) == 5
    # dropped grams score as backoff/OOV — still finite, still ordered
    s = corpus_df.select(score_lm(F.col("text"), tiny).alias("s")).collect()
    assert all(r["s"] is not None and r["s"] < 0 for r in s)


def test_score_plan_is_map_only(spark, corpus_df, model):
    plan = (
        corpus_df.select(score_lm(F.col("text"), model).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_save_load_roundtrip(spark, model, tmp_path):
    save_ngram_lm(spark, model, str(tmp_path / "lm"))
    loaded = load_ngram_lm(spark, str(tmp_path / "lm"))
    assert (loaded.unigrams, loaded.bigrams, loaded.total_tokens) == (
        model.unigrams,
        model.bigrams,
        model.total_tokens,
    )


def test_validation(spark, corpus_df):
    with pytest.raises(ValueError):
        train_ngram_lm(corpus_df, max_entries=0)
    with pytest.raises(ValueError):
        NgramLm(unigrams={}, bigrams={}, total_tokens=0)


def test_pipeline_lm_stage(spark, model, tmp_path):
    """corpus.lm-model-path drops the high-perplexity tail in the
    batch pipeline; the streaming curation builder accepts the same
    keys (stateless stage) and agrees on the same rows."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import (
        build_corpus_pipeline,
        build_streaming_curation,
    )

    path = str(tmp_path / "lm")
    save_ngram_lm(spark, model, path)
    mixed = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "zxqv wkjh plmq vvxz qqq jjjj wxyz mmmm kkkk"),
            (3, "a quick brown fox runs over the green hill"),
        ],
        "doc_id int, text string",
    )
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {
                    "lm-model-path": path,
                    "lm-max-perplexity": "300",
                }
            }
        }
    )
    batch_out = build_corpus_pipeline(cfg)(mixed)
    kept = sorted(r["doc_id"] for r in batch_out.select("doc_id").collect())
    assert kept == [1, 3]
    assert "lm_ppl" in batch_out.columns

    stream_out = build_streaming_curation(cfg)(mixed)
    assert sorted(
        r["doc_id"] for r in stream_out.select("doc_id").collect()
    ) == [1, 3]
