"""Distributed prefix sum (operators/prefixsum.py) + corpus sharding
(llm/pipeline.shard_corpus).

The contract under test: the two-pass hash-prefix-bucketed scan is
*equal* to the naive single-partition global window — bit-identical
positions and cumulative sums — on any input partitioning, while its
physical plan never funnels the data through one partition.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import shard_corpus
from sample_keyspaces_cdc_streams_connectors_spark.operators.prefixsum import with_order_stats


def _mk(spark, n=200, parts=5):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("h"),
            (F.col("id") % 17 + 1).alias("w"),
        )
        .repartition(parts)
    )


def _reference(df):
    """The naive global-window spelling (fine on test-sized data)."""
    w = Window.orderBy("h", "k")
    return {
        r["k"]: (r["pos"], r["cum"])
        for r in df.withColumn("pos", F.row_number().over(w) - 1)
        .withColumn(
            "cum",
            F.coalesce(
                F.sum("w").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .collect()
    }


@pytest.mark.parametrize("parts,n_buckets", [(1, 16), (5, 16), (5, 1), (3, 7)])
def test_matches_global_window(spark, parts, n_buckets):
    df = _mk(spark, parts=parts)
    ref = _reference(df)
    out, n_rows, total_w = with_order_stats(
        df, "h", ["k"], weight_col="w", n_buckets=n_buckets
    )
    got = {r["k"]: (r["pos"], r["cum"]) for r in out.collect()}
    assert got == ref
    assert n_rows == 200
    assert total_w == df.agg(F.sum("w")).first()[0]


def test_partitioning_invariant(spark):
    a, _, _ = with_order_stats(_mk(spark, parts=1), "h", ["k"], weight_col="w")
    b, _, _ = with_order_stats(_mk(spark, parts=11), "h", ["k"], weight_col="w")
    assert sorted(a.collect()) == sorted(b.collect())


def test_row_numbering_without_weight(spark):
    out, n_rows, total_w = with_order_stats(_mk(spark), "h", ["k"])
    assert total_w == 0
    assert n_rows == 200
    rows = out.select("pos").collect()
    assert sorted(r["pos"] for r in rows) == list(range(200))
    assert "cum" not in out.columns


def test_empty_input(spark):
    df = _mk(spark).filter(F.lit(False))
    out, n_rows, total_w = with_order_stats(df, "h", ["k"], weight_col="w")
    assert (n_rows, total_w) == (0, 0)
    assert out.count() == 0
    assert {"pos", "cum"} <= set(out.columns)


def test_no_single_partition_exchange(spark):
    """The scale contract: pass B's window partitions by the hash
    bucket — the plan must contain a hash exchange on the bucket and
    NO SinglePartition exchange anywhere."""
    out, _, _ = with_order_stats(
        _mk(spark), "h", ["k"], weight_col="w", n_buckets=16
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "_psb" in plan  # bucketed window partitioning


def test_shard_corpus_balance_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = shard_corpus(docs, n_shards=4).cache()
    try:
        n = docs.count()
        assert out.count() == n
        # positions are exactly 0..n-1
        assert out.agg(F.countDistinct("epoch_pos")).first()[0] == n
        assert out.agg(F.max("epoch_pos")).first()[0] == n - 1
        stats = (
            out.groupBy("shard").agg(F.sum("n_tokens").alias("t")).collect()
        )
        assert sorted(r["shard"] for r in stats) == [0, 1, 2, 3]
        total = sum(r["t"] for r in stats)
        max_doc = out.agg(F.max("n_tokens")).first()[0]
        # contiguous-cut balance bound: each shard within one doc of ideal
        for r in stats:
            assert r["t"] <= total / 4 + max_doc
        # shards are contiguous in epoch order
        ranges = {
            r["shard"]: (r["lo"], r["hi"])
            for r in out.groupBy("shard")
            .agg(F.min("epoch_pos").alias("lo"), F.max("epoch_pos").alias("hi"))
            .collect()
        }
        edge = -1
        for s in sorted(ranges):
            lo, hi = ranges[s]
            assert lo == edge + 1
            edge = hi
        # deterministic under repartitioning
        again = shard_corpus(docs.repartition(13), n_shards=4)
        assert sorted(out.collect()) == sorted(again.collect())
    finally:
        out.unpersist()


def test_shard_corpus_validates(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError):
        shard_corpus(docs, n_shards=0)
    with pytest.raises(ValueError):
        with_order_stats(docs, "text", ["doc_id"], n_buckets=0)


def test_persist_option_equal_and_caches_one_scan(spark):
    """persist=True must (a) leave the result bit-identical, (b)
    actually cache the bucketed input — pass B's plan reads
    InMemoryTableScan instead of recomputing the lineage — and (c)
    release via release_order_stats_cache."""
    from sample_keyspaces_cdc_streams_connectors_spark.operators.prefixsum import (
        release_order_stats_cache,
    )

    df = _mk(spark, n=150, parts=4)
    # other suites may hold their own live caches (ngram, models);
    # assert the DELTA this call adds, never global emptiness
    n_cached_before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    plain, n1, w1 = with_order_stats(
        df, hash_col="h", tiebreak_cols=["k"], weight_col="w", n_buckets=8
    )
    cached, n2, w2 = with_order_stats(
        df,
        hash_col="h",
        tiebreak_cols=["k"],
        weight_col="w",
        n_buckets=8,
        persist=True,
    )
    try:
        assert (n1, w1) == (n2, w2)
        a = {r["k"]: (r["pos"], r["cum"]) for r in plain.collect()}
        b = {r["k"]: (r["pos"], r["cum"]) for r in cached.collect()}
        assert a == b
        plan = cached._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        assert (
            len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
            == n_cached_before + 1
        )
    finally:
        release_order_stats_cache()
    assert (
        len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
        == n_cached_before
    )


def test_shard_corpus_persist_passthrough(spark, sf_dir):
    """shard_corpus(persist=True) is output-identical to the default
    (the knob only changes WHERE the tokenize runs, never the shards)."""
    from sample_keyspaces_cdc_streams_connectors_spark.operators.prefixsum import (
        release_order_stats_cache,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    base = {
        (r["doc_id"], r["epoch_pos"], r["shard"])
        for r in shard_corpus(docs, 8).collect()
    }
    got = {
        (r["doc_id"], r["epoch_pos"], r["shard"])
        for r in shard_corpus(docs, 8, persist=True).collect()
    }
    release_order_stats_cache()
    assert got == base


# --- pack_chunks: exact fixed-length packing over the prefix sum ------------


def test_pack_chunks_invariants_and_reference(spark, sf_dir):
    """Every window except the last holds EXACTLY seq_len tokens,
    every doc's spans tile [0, n_tokens) without gap or overlap, and
    the whole assignment matches a sequential single-process replay
    of the same epoch order."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import pack_chunks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    seq_len = 128
    rows = pack_chunks(docs, seq_len).collect()
    assert rows

    # per-window token totals: exactly seq_len except the last window
    per_chunk = {}
    per_doc = {}
    for r in rows:
        span = r["doc_end"] - r["doc_start"]
        assert span > 0
        assert 0 <= r["chunk_pos"] < seq_len
        per_chunk[r["chunk"]] = per_chunk.get(r["chunk"], 0) + span
        per_doc.setdefault(r["doc_id"], []).append(
            (r["doc_start"], r["doc_end"], r["chunk"], r["chunk_pos"])
        )
    last = max(per_chunk)
    for c, total in per_chunk.items():
        if c == last:
            assert 0 < total <= seq_len
        else:
            assert total == seq_len, c

    # per-doc spans tile [0, n_tokens) in consecutive windows
    n_tok = {
        r["doc_id"]: r["n_tokens"] for r in rows
    }
    for d, spans in per_doc.items():
        spans.sort()
        assert spans[0][0] == 0
        assert spans[-1][1] == n_tok[d]
        for (s1, e1, c1, _), (s2, e2, c2, _) in zip(spans, spans[1:]):
            assert e1 == s2 and c2 == c1 + 1

    # sequential reference over the same salted epoch order
    import hashlib

    base = []
    for r in docs.select("doc_id", "text").collect():
        toks = len((r["text"] or "").split())
        if toks > 0:
            h = hashlib.md5(f"epoch0:{r['doc_id']}".encode()).hexdigest()
            base.append((h, r["doc_id"], toks))
    base.sort()
    expect = set()
    cum = 0
    for _h, d, t in base:
        first, last_c = cum // seq_len, (cum + t - 1) // seq_len
        for c in range(first, last_c + 1):
            cs = c * seq_len
            expect.add(
                (
                    d,
                    c,
                    max(cs - cum, 0),
                    min(cs + seq_len - cum, t),
                    max(cum - cs, 0),
                )
            )
        cum += t
    got = {
        (r["doc_id"], r["chunk"], r["doc_start"], r["doc_end"], r["chunk_pos"])
        for r in rows
    }
    assert got == expect


def test_pack_chunks_partition_invariant_and_validates(spark, sf_dir):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import pack_chunks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    a = {tuple(r) for r in pack_chunks(docs, 64).collect()}
    b = {tuple(r) for r in pack_chunks(docs.repartition(7), 64).collect()}
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError, match="seq_len"):
        pack_chunks(docs, 0)


# --- pluggable token counter (r8) -------------------------------------------


def test_counter_none_is_bit_identical_to_default(spark, sf_dir):
    """counter=None must reproduce the pre-r8 whitespace-count output
    bit-for-bit, and an explicit token_count column/callable must
    equal it too (the parity contract for the default)."""
    from sample_keyspaces_cdc_streams_connectors_spark.functions.text import token_count
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import pack_chunks, shard_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = shard_corpus(docs, n_shards=8).orderBy("doc_id").collect()
    as_callable = (
        shard_corpus(docs, n_shards=8, counter=lambda c: token_count(c))
        .orderBy("doc_id")
        .collect()
    )
    as_column = (
        shard_corpus(
            docs, n_shards=8, counter=token_count(F.col("text"))
        )
        .orderBy("doc_id")
        .collect()
    )
    assert base == as_callable == as_column

    pc = pack_chunks(docs, seq_len=128).orderBy("doc_id", "chunk").collect()
    pc2 = (
        pack_chunks(
            docs, seq_len=128, counter=lambda c: token_count(c)
        )
        .orderBy("doc_id", "chunk")
        .collect()
    )
    assert pc == pc2


def test_bpe_counted_packing_properties(spark, sf_dir):
    """Packing by trained-BPE counts keeps every packing invariant
    (totality, window math in BPE units) and actually differs from
    whitespace counting (fertility > 1 on this corpus)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.bpe import bpe_token_count, train_bpe
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import (
        pack_chunks,
        pack_sequences,
        shard_corpus,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    model = train_bpe(docs, n_merges=50)
    counter = lambda c: bpe_token_count(c, model)

    bpe_totals = {
        r["doc_id"]: r["n_tokens"]
        for r in shard_corpus(docs, n_shards=4, counter=counter)
        .select("doc_id", "n_tokens")
        .collect()
    }
    ws_totals = {
        r["doc_id"]: r["n_tokens"]
        for r in shard_corpus(docs, n_shards=4)
        .select("doc_id", "n_tokens")
        .collect()
    }
    assert set(bpe_totals) == set(ws_totals)  # totality either way
    assert bpe_totals != ws_totals  # the counter genuinely changed weights

    # pack_chunks in BPE units: spans tile each doc exactly and no
    # span exceeds the window
    rows = pack_chunks(docs, seq_len=64, counter=counter).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for did, spans in per_doc.items():
        spans.sort(key=lambda r: r["doc_start"])
        assert spans[0]["doc_start"] == 0
        assert spans[-1]["doc_end"] == bpe_totals[did]
        for a, b in zip(spans, spans[1:]):
            assert a["doc_end"] == b["doc_start"]
        for s in spans:
            assert 0 < s["doc_end"] - s["doc_start"] <= 64

    # pack_sequences bound contract holds in BPE units
    packed = pack_sequences(docs, max_tokens=256, counter=counter)
    sums = (
        packed.groupBy("pack_shard", "message_idx")
        .agg(
            F.sum("n_tokens").alias("tot"),
            F.max("n_tokens").alias("mx"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert sums
    for r in sums:
        assert r["n"] == 1 or r["tot"] <= 256 + r["mx"]
