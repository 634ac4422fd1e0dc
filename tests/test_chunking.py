"""Sentence-aligned chunking: exact assignments on hand fixtures,
the size-bound contract, totality (no token lost), determinism, and
a property check against a sequential Python reference."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.chunking import chunk_documents, split_sentences


def test_split_sentences(spark):
    df = spark.createDataFrame(
        [(1, "One two. Three four!  Five?\nSix seven.")],
        "doc_id int, text string",
    )
    sents = df.select(split_sentences(F.col("text")).alias("s")).collect()[0][
        "s"
    ]
    assert sents == ["One two.", "Three four!", "Five?", "Six seven."]


def test_chunk_exact_assignment(spark):
    # sentences of 2 tokens each, budget 4 -> two sentences per chunk
    text = "a b. c d. e f. g h. i j."
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = chunk_documents(df, max_tokens=4).orderBy("chunk_idx").collect()
    assert [(r["chunk_idx"], r["chunk_text"], r["n_tokens"]) for r in rows] == [
        (0, "a b. c d.", 4),
        (1, "e f. g h.", 4),
        (2, "i j.", 2),
    ]


def test_oversized_sentence_gets_own_chunk(spark):
    text = "short one. " + " ".join(f"w{i}" for i in range(20)) + ". tail."
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = chunk_documents(df, max_tokens=5).orderBy("chunk_idx").collect()
    # the 21-token middle sentence never splits: exactly one chunk
    # exceeds the budget, it contains the whole long sentence, and
    # the bound (max + largest member) holds
    big = [r for r in rows if r["n_tokens"] > 5]
    assert len(big) == 1 and "w0" in big[0]["chunk_text"]
    assert big[0]["n_tokens"] <= 5 + 20  # bound: max + largest sentence
    # nothing lost ("w19." is one token — the period attaches)
    total = sum(r["n_tokens"] for r in rows)
    assert total == 2 + 20 + 1
    # chunk indexes are dense 0..k-1
    assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))


def test_blank_docs_produce_no_rows(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   \n "), (3, "real text here.")],
        "doc_id int, text string",
    )
    rows = chunk_documents(df, max_tokens=10).collect()
    assert {r["doc_id"] for r in rows} == {3}


def test_max_tokens_validated(spark):
    df = spark.createDataFrame([(1, "x.")], "doc_id int, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=0)


def test_runs_on_documents_table_with_bound(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = chunk_documents(docs, max_tokens=40).cache()
    # totality: chunk token sums equal sentence token sums per doc
    from sample_keyspaces_cdc_streams_connectors_spark.functions.text import token_count

    sent_totals = (
        docs.select(
            "doc_id",
            F.explode(split_sentences(F.col("text"))).alias("s"),
        )
        .select("doc_id", token_count(F.col("s")).alias("n"))
        .groupBy("doc_id")
        .agg(F.sum("n").alias("t"))
    )
    chunk_totals = chunks.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("t2")
    )
    mismatch = sent_totals.join(chunk_totals, "doc_id").filter(
        F.col("t") != F.col("t2")
    )
    assert mismatch.count() == 0
    # bound contract: every chunk <= max + its own largest sentence
    # (largest sentence <= chunk tokens, so 2*max is a safe envelope
    # only when no sentence exceeds max; assert the exact contract
    # via per-chunk max sentence length)
    per_chunk = (
        chunks.select(
            "doc_id",
            "chunk_idx",
            "n_tokens",
            F.transform(
                F.split("chunk_text", r"(?<=[.!?])\s+"),
                lambda s: token_count(s),
            ).alias("lens"),
        )
        .withColumn("max_sent", F.array_max("lens"))
        .filter(F.col("n_tokens") > 40 + F.col("max_sent"))
    )
    assert per_chunk.count() == 0
    chunks.unpersist()


SLOW = settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(
    lens=st.lists(st.integers(1, 12), min_size=1, max_size=25),
    budget=st.integers(3, 20),
)
def test_matches_sequential_reference(spark, lens, budget):
    """The window-cumsum assignment equals the documented boundary
    rule: sentence i opens a new chunk when its exclusive prefix
    crosses a multiple of the budget."""
    sents = [" ".join(f"t{i}x{j}" for j in range(n)) + "." for i, n in enumerate(lens)]
    df = spark.createDataFrame(
        [(1, " ".join(sents))], "doc_id int, text string"
    )
    rows = (
        chunk_documents(df, max_tokens=budget)
        .orderBy("chunk_idx")
        .collect()
    )
    # sequential reference: bucket = floor(exclusive_prefix / budget)
    expected: dict[int, int] = {}
    prefix = 0
    for i, n in enumerate(lens):
        expected.setdefault(prefix // budget, 0)
        expected[prefix // budget] += n
        prefix += n
    got = {i: r["n_tokens"] for i, r in enumerate(rows)}
    assert list(got.values()) == list(expected.values())
