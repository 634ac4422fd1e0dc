"""BPE tokenizer (llm/bpe.py): training equivalence to a sequential
reference, greedy-segmentation properties, and the map-only encode
plan contract."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.bpe import (
    BpeModel,
    bpe_segment,
    bpe_token_count,
    train_bpe,
)

CORPUS = [
    "low low low low low",
    "lower lower newer newer newer newer",
    "newest newest newest widest widest",
    "the new wide low river",
]


def _reference_merges(texts, n_merges):
    """Independent quadratic BPE trainer (test-local, no shared code
    with the module beyond the spec: max count, lexicographic
    tie-break, stop below count 2, '</w>' end sentinel)."""
    freqs = Counter(w for t in texts for w in t.lower().split())
    vocab = {tuple(w) + ("</w>",): c for w, c in freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        out_vocab = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            out_vocab[tuple(out)] += c
        vocab = out_vocab
        merges.append(best)
    return tuple(merges)


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )


def test_training_matches_sequential_reference(spark, corpus_df):
    for n in (0, 5, 40):
        model = train_bpe(corpus_df, n_merges=n)
        assert model.merges == _reference_merges(CORPUS, n)


def test_training_partitioning_invariant(spark, corpus_df):
    a = train_bpe(corpus_df.repartition(1), n_merges=20)
    b = train_bpe(corpus_df.repartition(7), n_merges=20)
    assert a.merges == b.merges


def test_segmentation_reconstructs_text(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    model = train_bpe(docs, n_merges=60)
    rows = docs.select(
        "text", bpe_segment(F.col("text"), model).alias("p")
    ).collect()
    for r in rows:
        rebuilt = "".join(r["p"]).replace("</w>", " ").strip()
        assert rebuilt == " ".join(r["text"].lower().split())


def test_count_equals_segment_length(spark, corpus_df):
    model = train_bpe(corpus_df, n_merges=15)
    rows = corpus_df.select(
        bpe_segment(F.col("text"), model).alias("p"),
        bpe_token_count(F.col("text"), model).alias("n"),
    ).collect()
    for r in rows:
        assert r["n"] == len(r["p"])


def test_merges_compress(spark, corpus_df):
    """More merges never increase the token count, and frequent words
    collapse to single tokens."""
    m0 = BpeModel(merges=())
    m40 = train_bpe(corpus_df, n_merges=40)
    base, merged = (
        corpus_df.agg(
            F.sum(bpe_token_count(F.col("text"), m)).alias("n")
        ).first()["n"]
        for m in (m0, m40)
    )
    assert merged < base
    seg = spark.createDataFrame([("newer",)], "text string").select(
        bpe_segment(F.col("text"), m40).alias("p")
    ).first()["p"]
    assert seg == ["newer</w>"]


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "doc_id int, text string"
    )
    model = BpeModel(merges=(("a", "b"),))
    rows = {
        r["doc_id"]: (r["n"], r["p"])
        for r in df.select(
            "doc_id",
            bpe_token_count(F.col("text"), model).alias("n"),
            bpe_segment(F.col("text"), model).alias("p"),
        ).collect()
    }
    assert rows[1] == (None, None)
    assert rows[2] == (0, [])
    assert rows[3] == (0, [])


def test_max_words_cap_is_deterministic(spark, corpus_df):
    """Capping the frequency table keeps the most frequent words
    (word-lexicographic tie-break) — same table, same merges."""
    a = train_bpe(corpus_df, n_merges=10, max_words=3)
    freqs = Counter(w for t in CORPUS for w in t.lower().split())
    top3 = dict(
        sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.bpe import _train_on_freqs

    assert a.merges == _train_on_freqs(top3, 10)


def test_encode_plan_is_map_only(spark, corpus_df):
    model = train_bpe(corpus_df, n_merges=5)
    plan = (
        corpus_df.select(bpe_token_count(F.col("text"), model).alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_validation(spark, corpus_df):
    with pytest.raises(ValueError):
        train_bpe(corpus_df, n_merges=-1)
    with pytest.raises(ValueError):
        train_bpe(corpus_df, n_merges=1, max_words=0)


def test_save_load_roundtrip(spark, corpus_df, tmp_path):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.bpe import load_bpe_model, save_bpe_model

    model = train_bpe(corpus_df, n_merges=25)
    save_bpe_model(spark, model, str(tmp_path / "bpe"))
    assert load_bpe_model(spark, str(tmp_path / "bpe")).merges == model.merges
    # empty model round-trips too
    save_bpe_model(spark, BpeModel(merges=()), str(tmp_path / "bpe0"))
    assert load_bpe_model(spark, str(tmp_path / "bpe0")).merges == ()


def test_unicode_whitespace_matches_training_tokenizer(spark):
    """Encode-time word splitting is ASCII-\\s only, matching the JVM
    tokenizer training counts with: U+00A0 stays INSIDE a word on
    both sides (r5 review finding — python str.split() would split
    it, so encode-time words would never match trained shapes)."""
    model = train_bpe(
        spark.createDataFrame([("a b a b plain",)], "text string"),
        n_merges=10,
    )
    # the trained vocabulary counted "a b" as ONE word; the
    # encoder must segment the identical single word (2 rows -> same
    # pieces), not two words "a" and "b"
    out = spark.createDataFrame(
        [("a b",), ("plain",)], "text string"
    ).select(bpe_segment(F.col("text"), model).alias("p")).collect()
    joined = "".join(out[0]["p"])
    assert joined == "a b</w>"  # one </w> => one word
    assert "".join(out[1]["p"]) == "plain</w>"
