"""Eval-set decontamination (llm/decontaminate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.decontaminate import (
    contamination_flags,
    decontaminate,
    eval_gram_hashes,
)

EVAL_Q = (
    "what is the capital of france the answer is paris of course it is"
)


def _corpus(spark):
    rows = [
        # verbatim leak of the eval question
        (1, f"some preamble text {EVAL_Q} and a trailing explanation"),
        # partial leak: one shared 8-gram window
        (2, "quiz says what is the capital of france the answer is unknown"),
        # clean
        (3, "completely unrelated document about spark physical planning"),
        # clean but topically similar (no 8-gram overlap)
        (4, "the capital city of germany is berlin which is not france"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _eval(spark):
    return spark.createDataFrame([(100, EVAL_Q)], "doc_id long, text string")


def test_flags_and_counts(spark):
    out = {
        r.doc_id: r
        for r in contamination_flags(
            _corpus(spark), _eval(spark), k=8
        ).collect()
    }
    assert out[1].contaminated and out[1].n_eval_collisions >= 5
    assert out[2].contaminated and out[2].n_eval_collisions >= 1
    assert not out[3].contaminated and out[3].n_eval_collisions == 0
    assert not out[4].contaminated


def test_decontaminate_preserves_schema_and_drops(spark):
    corpus = _corpus(spark)
    clean = decontaminate(corpus, _eval(spark), k=8)
    assert clean.columns == corpus.columns
    assert {r.doc_id for r in clean.collect()} == {3, 4}


def test_min_collisions_threshold(spark):
    # requiring >=5 shared grams keeps the single-window partial leak
    out = decontaminate(_corpus(spark), _eval(spark), k=8, min_collisions=5)
    assert {r.doc_id for r in out.collect()} == {2, 3, 4}


def test_empty_eval_set_keeps_everything(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    corpus = _corpus(spark)
    assert decontaminate(corpus, empty).count() == corpus.count()


def test_eval_grams_distinct_and_hashed(spark):
    grams = eval_gram_hashes(_eval(spark), k=8)
    rows = grams.collect()
    assert len(rows) == len({r.gram for r in rows})  # distinct
    assert all(isinstance(r.gram, int) for r in rows)  # 60-bit ints


def test_plan_shape_broadcast_probe_no_corpus_shuffle_before_join(spark):
    """The eval probe must be a BroadcastHashJoin (corpus side never
    shuffles to meet the eval set), and the corpus gram expansion a
    Generate, not a join."""
    plan = (
        contamination_flags(_corpus(spark), _eval(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert re.search(r"BroadcastHashJoin \[gram#\d+L\]", plan), (
        "eval probe must broadcast-join on the int64 gram key"
    )
    assert "Generate explode" in plan
    # (the final flag join's strategy is AQE's runtime choice — the
    # counts side is contamination-sized and broadcasts in practice)


def test_map_only_probe_matches_join_formulation(spark):
    """The stateless broadcast-membership probe must make IDENTICAL
    decisions (and counts) to the join formulation — including docs
    with zero grams and an empty eval table."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.decontaminate import (
        contamination_flags_map_only,
        decontaminate_map_only,
        eval_gram_table,
    )

    corpus = _corpus(spark).union(
        spark.createDataFrame([(5, ""), (6, "short")], "doc_id long, text string")
    )
    table = eval_gram_table(_eval(spark), k=8)
    joined = {
        r.doc_id: (r.n_eval_collisions, r.contaminated)
        for r in contamination_flags(corpus, _eval(spark), k=8).collect()
    }
    mapped = {
        r.doc_id: (r.n_eval_collisions, r.contaminated)
        for r in contamination_flags_map_only(corpus, table, k=8).collect()
    }
    assert mapped == joined

    clean = decontaminate_map_only(corpus, table, k=8)
    assert clean.columns == corpus.columns
    assert {r.doc_id for r in clean.collect()} == {
        d for d, (_, c) in joined.items() if not c
    }

    empty = spark.createDataFrame([], "doc_id long, text string")
    empty_table = eval_gram_table(empty, k=8)
    assert decontaminate_map_only(corpus, empty_table, k=8).count() == corpus.count()
