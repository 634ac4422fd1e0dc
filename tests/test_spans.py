"""Repeated-span removal (llm/spans.py): boilerplate scrubbing,
byte-preservation of untouched docs, overlap merging, and the
scrub-vs-interval-math equivalence behind the dedup_spans oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.spans import (
    flag_repeated_spans,
    remove_repeated_spans,
)

BOILER = "this content is provided under the creative commons license terms"


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, f"unique thoughts about spark planning. {BOILER} more unique analysis follows"),
        (2, f"{BOILER} completely different body text in the second document"),
        (3, f"third document body with its own words then {BOILER}"),
        (4, "a document with no boilerplate at all, just original prose"),
        # overlapping repeats: two shifted copies of the boiler words
        (5, f"{BOILER} {BOILER}"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_removed_unique_kept(spark, corpus):
    out = {
        r.doc_id: r
        for r in remove_repeated_spans(corpus, k=5, min_docs=3).collect()
    }
    for d in (1, 2, 3, 5):
        assert "creative commons" not in out[d].text
        assert out[d].n_removed_tokens > 0
    assert "unique thoughts" in out[1].text
    assert "unique analysis" in out[1].text
    assert "different body text" in out[2].text


def test_untouched_docs_keep_original_bytes(spark, corpus):
    original = corpus.filter(F.col("doc_id") == 4).first()["text"]
    row = (
        remove_repeated_spans(corpus, k=5, min_docs=3)
        .filter(F.col("doc_id") == 4)
        .first()
    )
    assert row["text"] == original  # not even re-normalized
    assert row["n_removed_tokens"] == 0 and row["n_flagged_spans"] == 0


def test_overlapping_spans_merge(spark, corpus):
    """Consecutive flagged starts cover overlapping windows: removed
    tokens must count DISTINCT indexes, strictly less than spans*k."""
    row = (
        remove_repeated_spans(corpus, k=5, min_docs=3)
        .filter(F.col("doc_id") == 1)
        .first()
    )
    assert row.n_flagged_spans > 1
    assert row.n_removed_tokens < row.n_flagged_spans * 5


def test_scrub_equals_interval_math(spark, corpus):
    """The Arrow scrub's removed-token count must equal the pure-JVM
    sequence/flatten/array_distinct coverage count (the dedup_spans
    oracle formulation) on every doc."""
    from sample_keyspaces_cdc_streams_connectors_spark.functions.text import normalize_text, tokens

    k = 5
    scrubbed = {
        r.doc_id: r.n_removed_tokens
        for r in remove_repeated_spans(corpus, k=k, min_docs=2).collect()
    }
    flagged = flag_repeated_spans(corpus, k=k, min_docs=2)
    base = corpus.select(
        "doc_id", F.size(tokens(normalize_text(F.col("text")))).alias("n")
    )
    covered = F.size(
        F.array_distinct(
            F.flatten(
                F.transform(
                    "__starts",
                    lambda p: F.sequence(
                        p, F.least(p + k - 1, F.col("n") - 1)
                    ),
                )
            )
        )
    )
    expr = {
        r.doc_id: r.c
        for r in base.join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("__starts").isNotNull(), covered)
            .otherwise(0)
            .alias("c"),
        )
        .collect()
    }
    assert scrubbed == expr


def test_short_repeated_doc_fully_scrubbed(spark):
    """Docs shorter than k form one whole-doc window (shingle rule):
    a short string repeated across docs scrubs to empty."""
    df = spark.createDataFrame(
        [(1, "tiny repeated line"), (2, "tiny repeated line"), (3, "another doc")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_repeated_spans(df, k=10, min_docs=2).collect()}
    assert out[1].text == "" and out[2].text == ""
    assert out[1].n_removed_tokens == 3
    assert out[3].text == "another doc"


def test_pipeline_stage_remove_repeated_spans(spark, corpus):
    from sample_keyspaces_cdc_streams_connectors_spark.config import ConfigError, load_config
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import (
        build_corpus_pipeline,
        build_streaming_curation,
    )

    conf = {
        "keyspaces-cdc-streams": {
            "corpus": {
                "remove-repeated-spans": "true",
                "span-k": 5,
                "span-min-docs": 3,
            }
        }
    }
    out = build_corpus_pipeline(load_config(conf))(corpus)
    texts = {r.doc_id: r.text for r in out.select("doc_id", "text").collect()}
    assert "creative commons" not in texts[1]
    assert "unique thoughts" in texts[1]
    # annotations are computed on the SCRUBBED text
    row = out.filter(F.col("doc_id") == 5).first()
    assert row.n_tokens == row.text.count(" ") + (1 if row.text else 0)

    with pytest.raises(ConfigError) as e:
        build_streaming_curation(load_config(conf))
    assert "remove-repeated-spans" in str(e.value)


def test_empty_docs_never_flagged(spark):
    """Empty/whitespace-only docs must report 0 flagged / 0 removed
    and keep their bytes — matching the oracle, where the coverage
    join drops zero-token docs (the latent sequence(0,-1) divergence
    found in review)."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, ""), (4, "real words in here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_repeated_spans(df, k=5, min_docs=2).collect()}
    for d in (1, 2, 3):
        assert out[d].n_flagged_spans == 0 and out[d].n_removed_tokens == 0
    assert out[2].text == "   "  # bytes preserved
