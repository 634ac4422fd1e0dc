"""Trainable multiclass language-ID (llm/langid.py): holdout
accuracy on separable synthetic languages, determinism, persistence,
the map-only scoring plan, and the pipeline/CLI wiring."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.langid import (
    char_ngram_features,
    load_langid_model,
    save_langid_model,
    score_langid,
    train_langid,
)

_ALPHABETS = {
    "lat": "etaoinshrdlu ",
    "grk": "αβγδεζηθικλμ ",
    "cyr": "абвгдежзиклм ",
}


def _corpus(spark, n_per_lang=120, seed=42):
    rng = random.Random(seed)
    rows = []
    i = 0
    for lang, chars in _ALPHABETS.items():
        for _ in range(n_per_lang):
            rows.append(
                (i, "".join(rng.choice(chars) for _ in range(80)), lang)
            )
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


@pytest.fixture(scope="module")
def corpus(spark):
    return _corpus(spark).cache()


@pytest.fixture(scope="module")
def model(corpus):
    return train_langid(
        corpus.filter(F.col("doc_id") % 5 != 0), n_iters=30
    )


def test_holdout_accuracy(spark, corpus, model):
    test = corpus.filter(F.col("doc_id") % 5 == 0)
    scored = score_langid(test, model)
    acc = scored.filter(F.col("lang") == F.col("label")).count() / test.count()
    assert acc >= 0.95
    # confidences are probabilities
    row = scored.agg(F.min("lang_conf"), F.max("lang_conf")).first()
    assert 0.0 <= row[0] and row[1] <= 1.0


def test_labels_sorted_and_deterministic(spark, corpus, model):
    assert model.labels == sorted(_ALPHABETS)
    again = train_langid(
        corpus.filter(F.col("doc_id") % 5 != 0).repartition(7), n_iters=30
    )
    assert again.labels == model.labels
    import numpy as np

    assert np.array_equal(again.weights, model.weights)
    assert np.array_equal(again.bias, model.bias)


def test_save_load_roundtrip_predicts_identically(
    spark, corpus, model, tmp_path
):
    path = str(tmp_path / "lid")
    save_langid_model(spark, model, path)
    loaded = load_langid_model(spark, path)
    assert loaded.labels == model.labels
    a = {
        r["doc_id"]: (r["lang"], round(r["lang_conf"], 12))
        for r in score_langid(corpus, model).collect()
    }
    b = {
        r["doc_id"]: (r["lang"], round(r["lang_conf"], 12))
        for r in score_langid(corpus, loaded).collect()
    }
    assert a == b


def test_scoring_plan_map_only(spark, corpus, model):
    plan = (
        score_langid(corpus, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan  # one Arrow kernel, no row UDFs
    assert "BatchEvalPython" not in plan


def test_empty_text_predicts_unknown(spark, model):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "etaoin shrdlu tea oil")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in score_langid(df, model).collect()}
    assert rows[1]["lang"] == "unknown" and rows[1]["lang_conf"] == 0.0
    assert rows[2]["lang"] == "unknown"
    assert rows[3]["lang"] == "lat"


def test_char_ngram_features_shape(spark):
    df = spark.createDataFrame([("abc",), ("", ), (None,)], "t string")
    rows = df.select(
        char_ngram_features(F.col("t"), 64).alias("f")
    ).collect()
    # "abc": 3 unigrams + 2 bigrams + 1 trigram
    assert len(rows[0]["f"]) == 6
    assert rows[1]["f"] == [] and rows[2]["f"] == []
    assert all(0 <= b < 64 for b in rows[0]["f"])


def test_single_class_rejected(spark):
    df = spark.createDataFrame(
        [(1, "aaa", "only")], "doc_id long, text string, label string"
    )
    with pytest.raises(ValueError, match="2 distinct labels"):
        train_langid(df)


def test_pipeline_langid_model_stage(spark, corpus, model, tmp_path):
    """corpus.langid-model-path replaces the heuristic lang column
    before the language filter — batch and streaming agree."""
    import uuid

    from sample_keyspaces_cdc_streams_connectors_spark.config import load_config
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import (
        build_corpus_pipeline,
        build_streaming_curation,
    )

    path = str(tmp_path / "lidp")
    save_langid_model(spark, model, path)
    conf = {
        "keyspaces-cdc-streams": {
            "corpus": {"langid-model-path": path, "languages": "grk"}
        }
    }
    src = str(tmp_path / "src")
    corpus.select("doc_id", "text", "label").repartition(3).write.parquet(src)

    batch = build_corpus_pipeline(load_config(conf))(spark.read.parquet(src))
    kept = batch.select("doc_id", "lang", "lang_conf", "label").collect()
    assert kept and all(r["lang"] == "grk" for r in kept)
    # the model actually gates: (almost) only true-greek docs survive
    frac_grk = sum(r["label"] == "grk" for r in kept) / len(kept)
    assert frac_grk >= 0.95

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"lid_{uuid.uuid4().hex[:8]}"
    q = (
        build_streaming_curation(load_config(conf))(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    streamed = {
        r["doc_id"] for r in spark.table(name).select("doc_id").collect()
    }
    spark.catalog.dropTempView(name)
    assert streamed == {r["doc_id"] for r in kept}


def test_cli_train_langid(spark, corpus, tmp_path, capsys):
    from sample_keyspaces_cdc_streams_connectors_spark.__main__ import main

    src = str(tmp_path / "labeled")
    corpus.select("doc_id", "text", "label").write.parquet(src)
    out = str(tmp_path / "lidmodel")
    rc = main(["--source", src, "--mode", "train-langid", "--out", out])
    assert rc == 0
    assert "3 classes" in capsys.readouterr().out
    loaded = load_langid_model(spark, out)
    assert loaded.labels == sorted(_ALPHABETS)


def test_null_labels_dropped_in_training(spark):
    """NULL-label rows must not reach the residual kernel (r9: they
    made __y NULL and crashed the int cast mid-iteration)."""
    rows = [(i, "aaa bbb aaa", "a") for i in range(8)]
    rows += [(100 + i, "zzz yyy zzz", "z") for i in range(8)]
    rows += [(200, "unlabeled text here", None), (201, "more text", None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label string")
    m = train_langid(df, n_buckets=256, n_iters=8)
    assert m.labels == ["a", "z"]
    got = {
        r["doc_id"]: r["lang"]
        for r in score_langid(
            spark.createDataFrame(
                [(1, "aaa aaa"), (2, "zzz zzz")], "doc_id long, text string"
            ),
            m,
        ).collect()
    }
    assert got == {1: "a", 2: "z"}


def test_char_ngram_features_max_chars_cap(spark):
    """Gram expansion is bounded by max_chars (r9: uncapped
    multi-megabyte docs ballooned Arrow batches); prediction on a
    capped prefix still sees full signal for normal docs."""
    df = spark.createDataFrame([("abcdef",)], "t string")
    capped = df.select(
        char_ngram_features(F.col("t"), 64, max_chars=3).alias("f")
    ).collect()[0]["f"]
    full = df.select(
        char_ngram_features(F.col("t"), 64, max_chars=0).alias("f")
    ).collect()[0]["f"]
    # 3 chars -> 3 + 2 + 1 = 6 grams; 6 chars -> 6 + 5 + 4 = 15
    assert len(capped) == 6 and len(full) == 15
    prefix = df.select(
        char_ngram_features(F.substring(F.col("t"), 1, 3), 64).alias("f")
    ).collect()[0]["f"]
    assert capped == prefix
