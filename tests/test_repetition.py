"""Gopher-style repetition statistics — exact hand-computed values on
tiny fixtures, plan shape (no shuffle / no Python), and the filter's
threshold semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.functions.repetition import (
    GOPHER_DEFAULTS,
    repetition_filter,
    with_repetition_stats,
)


def _stats(spark, text: str) -> dict:
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    return with_repetition_stats(df).collect()[0].asDict()


def test_dup_line_fractions_exact(spark):
    # 5 non-blank lines, one repeated once -> 1/5 of occurrences dup;
    # lines: "alpha beta"(10) "no"(2) "alpha beta"(10) "cd ef"(5) "xyz"(3)
    # dup chars = len("alpha beta") = 10 over total 30
    text = "alpha beta\nno\n\nalpha beta\ncd ef\nxyz"
    row = _stats(spark, text)
    assert row["dup_line_frac"] == pytest.approx(1 / 5)
    assert row["dup_line_char_frac"] == pytest.approx(10 / 30)


def test_top_2gram_char_fraction_exact(spark):
    # tokens: a b a b a b -> 2-grams: "a b","b a","a b","b a","a b"
    # mode "a b" x3, len 3; normalized text = "a b a b a b" (11 chars)
    row = _stats(spark, "a b a b a b")
    assert row["top_2gram_char_frac"] == pytest.approx(9 / 11)


def test_dup_ngram_fraction_exact(spark):
    # 12 identical tokens -> 5-grams: 8 occurrences, 1 distinct
    row = _stats(spark, " ".join(["tok"] * 12))
    assert row["dup_5gram_frac"] == pytest.approx(7 / 8)
    # 10-grams: 3 occurrences, 1 distinct
    assert row["dup_10gram_frac"] == pytest.approx(2 / 3)


def test_clean_doc_passes_all_defaults(spark):
    clean = (
        "The quick brown fox jumps over the lazy dog near the river.\n"
        "It was a bright cold day in April and the clocks were striking.\n"
        "Many years later he remembered that distant afternoon clearly."
    )
    df = spark.createDataFrame([(1, clean)], "doc_id int, text string")
    assert repetition_filter(df).count() == 1
    # output schema unchanged when keep_stats is off
    assert repetition_filter(df).columns == ["doc_id", "text"]


def test_boilerplate_doc_dropped(spark):
    spam = "\n".join(["click here to subscribe now"] * 40)
    df = spark.createDataFrame([(1, spam)], "doc_id int, text string")
    assert repetition_filter(df).count() == 0
    kept = repetition_filter(
        df, thresholds={k: None for k in GOPHER_DEFAULTS}
    )
    assert kept.count() == 1  # all rules disabled -> passes


def test_min_direction_alpha_rule(spark):
    numbery = " ".join(str(i) for i in range(50))
    df = spark.createDataFrame([(1, numbery)], "doc_id int, text string")
    stats = with_repetition_stats(df).collect()[0]
    assert stats["alpha_word_frac"] == 0.0
    assert repetition_filter(df).count() == 0
    assert (
        repetition_filter(df, thresholds={"alpha_word_frac": 0.0}).count()
        == 1
    )


def test_unknown_threshold_key_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(KeyError):
        repetition_filter(df, thresholds={"nope": 0.5})


def test_empty_and_blank_docs_survive_without_error(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   \n  \n"), (3, "one clean line of text")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    for did in (1, 2):
        assert rows[did]["dup_line_frac"] == 0.0
        assert rows[did]["top_2gram_char_frac"] == 0.0


def test_plan_is_narrow_and_jvm_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        with_repetition_stats(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_runs_on_real_documents_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = repetition_filter(docs, keep_stats=True)
    n_in, n_kept = docs.count(), kept.count()
    assert 0 < n_kept <= n_in
    # stats are well-formed fractions
    agg = kept.agg(
        F.max("dup_line_frac"), F.min("alpha_word_frac")
    ).collect()[0]
    assert 0.0 <= agg[0] <= 0.30
    assert agg[1] >= 0.80


def test_filter_does_not_inline_stats_into_condition(spark, sf_dir):
    """The observe barrier must keep the filter ABOVE the stats
    projections: a pushed-down condition re-inlines the tokenizer
    hundreds of times (measured 60x slower).  Pin the plan: the
    tokenizer split() appears a handful of times, never hundreds,
    and the filter sits above a CollectMetrics node."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        repetition_filter(docs)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("split(") < 20
    assert "CollectMetrics" in plan


def test_stat_name_collision_rejected(spark):
    df = spark.createDataFrame(
        [(1, "x", 0.5)], "doc_id int, text string, dup_line_frac double"
    )
    with pytest.raises(ValueError, match="dup_line_frac"):
        with_repetition_stats(df)
