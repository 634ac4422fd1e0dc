"""The streaming curation-ingest loop (streaming/ingest.py):
curate → sink → extend every standing index, with r9's in-loop text
compaction.  The foreachBatch callable is driven directly with
sequential batch frames — exactly how Structured Streaming invokes
it."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.config import load_config
from sample_keyspaces_cdc_streams_connectors_spark.streaming.ingest import curation_ingest_sink


def _batches(spark, sf_dir, n=4):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return [docs.filter(F.col("doc_id") % n == i) for i in range(n)]


def test_ingest_loop_end_to_end(spark, sf_dir, tmp_path):
    """4 sequential batches through the full sink: cross-batch
    duplicates suppressed by the standing fingerprint index, all
    survivors searchable in the text index, and compaction every 2
    batches keeps the posting layout bounded (≤2 files per bucket at
    any point, 1 after the last compaction ran)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import build_dedup_index
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import bm25_topk, write_text_index

    from sample_keyspaces_cdc_streams_connectors_spark.llm.embedding import hash_embed
    from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import write_semantic_index

    out = str(tmp_path / "out")
    didx = str(tmp_path / "didx")
    tidx = str(tmp_path / "tidx")
    sidx = str(tmp_path / "sidx")
    batches = _batches(spark, sf_dir)
    seed = batches[0]
    # standing indexes pre-exist (built from an initial corpus slice)
    build_dedup_index(seed, didx, mode="exact")
    write_text_index(seed, tidx)
    write_semantic_index(
        seed.select(
            F.col("doc_id").alias("vec_id"),
            hash_embed(F.col("text"), dims=16).alias("embedding"),
        ),
        sidx,
        k=4,
    )
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {
                    "dedup-index-path": didx,
                    "text-index-path": tidx,
                    "text-index-compact-every": "2",
                    "semantic-index-path": sidx,
                    "semantic-dims": "16",
                }
            }
        }
    )
    n_sem0 = spark.read.parquet(f"{sidx}/members").count()
    handle = curation_ingest_sink(cfg, out)
    # batch 1 re-sends HALF of the seed docs (duplicates) + batch 1
    dup_half = seed.filter(F.col("doc_id") % 8 == 0)
    handle(batches[1].unionByName(dup_half), 1)
    handle(batches[2], 2)
    # batch 3 re-sends a batch-2 doc — suppressed by batch 2's append
    redo = batches[2].limit(1)
    handle(batches[3].unionByName(redo), 3)

    sunk = spark.read.parquet(out)
    ids = {r["doc_id"] for r in sunk.select("doc_id").collect()}
    # no seed (batch-0) duplicate survived; every fresh doc did
    assert ids == {
        r["doc_id"]
        for b in batches[1:]
        for r in b.select("doc_id").collect()
    }
    assert sunk.count() == len(ids)  # the batch-3 re-send was dropped

    # the text index serves docs from the seed AND every batch
    hits = {
        r["doc"]
        for r in bm25_topk(
            spark, tidx, "data stream window batch", k=40
        ).collect()
    }
    assert any(h % 4 == 0 for h in hits)  # seed docs still indexed
    assert any(h % 4 != 0 for h in hits)  # ingested docs indexed

    # the SEMANTIC index grew too — the r9 cache-invalidation bug made
    # every standing-index append AFTER the fingerprint append see a
    # recomputed-to-empty survivors frame and silently append nothing
    n_sem1 = spark.read.parquet(f"{sidx}/members").count()
    assert n_sem1 > n_sem0

    # compaction ran at batch 2 (1 file/bucket then) and batch 3
    # appended one more segment: never more than 2 files per bucket
    for name in os.listdir(f"{tidx}/postings"):
        if name.startswith("tb="):
            files = [
                f
                for f in os.listdir(f"{tidx}/postings/{name}")
                if f.endswith(".parquet")
            ]
            assert 1 <= len(files) <= 2, (name, files)


def test_ingest_compact_every_validates(spark, tmp_path):
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"text-index-compact-every": "-1"}
            }
        }
    )
    with pytest.raises(ValueError, match="compact-every"):
        curation_ingest_sink(cfg, str(tmp_path / "o"))
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"dedup-index-compact-every": "-1"}
            }
        }
    )
    with pytest.raises(ValueError, match="dedup-index-compact-every"):
        curation_ingest_sink(cfg, str(tmp_path / "o"))
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"ingest-checkpoint": "bogus"}
            }
        }
    )
    with pytest.raises(ValueError, match="ingest-checkpoint"):
        curation_ingest_sink(cfg, str(tmp_path / "o"))


def test_ingest_loop_compacts_dedup_index(spark, sf_dir, tmp_path):
    """r10: the fingerprint index (the loop's default dedup gate) gets
    in-loop compaction — every append adds one file per touched
    bucket, so across 4 batches file counts stay bounded by the
    compaction cadence instead of growing one-per-batch; suppression
    behavior is unchanged."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import build_dedup_index

    out = str(tmp_path / "out")
    didx = str(tmp_path / "didx")
    batches = _batches(spark, sf_dir)
    build_dedup_index(batches[0], didx, mode="exact")
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {
                    "dedup-index-path": didx,
                    "dedup-index-compact-every": "2",
                }
            }
        }
    )
    handle = curation_ingest_sink(cfg, out)
    handle(batches[1], 1)
    handle(batches[2], 2)  # compaction fires here
    handle(batches[3].unionByName(batches[2].limit(1)), 3)

    # build(1 file) + appends 1,2 = up to 3 before compaction; batch 2
    # compacted everything to 1, batch 3 appended 1 → ≤2 at the end
    for name in os.listdir(f"{didx}/exact"):
        if name.startswith("bucket="):
            files = [
                f
                for f in os.listdir(f"{didx}/exact/{name}")
                if f.endswith(".parquet")
            ]
            assert 1 <= len(files) <= 2, (name, files)
    # suppression survived compaction: the batch-2 re-send was dropped
    sunk = spark.read.parquet(out)
    assert sunk.count() == sunk.select("doc_id").distinct().count()
    want = {
        r["doc_id"]
        for b in batches[1:]
        for r in b.select("doc_id").collect()
    }
    assert {r["doc_id"] for r in sunk.select("doc_id").collect()} == want


def test_ingest_reliable_checkpoint_mode(spark, sf_dir, tmp_path):
    """corpus.ingest-checkpoint = reliable materializes survivors via
    checkpoint() against the configured dir — same multi-index loop
    semantics (the r9 cache-invalidation scenario), but the survivors
    frame lives in fault-tolerant storage instead of executor-local
    blocks."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import build_dedup_index
    from sample_keyspaces_cdc_streams_connectors_spark.llm.embedding import hash_embed
    from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import write_semantic_index

    out = str(tmp_path / "out")
    didx = str(tmp_path / "didx")
    sidx = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")
    batches = _batches(spark, sf_dir)
    build_dedup_index(batches[0], didx, mode="exact")
    write_semantic_index(
        batches[0].select(
            F.col("doc_id").alias("vec_id"),
            hash_embed(F.col("text"), dims=16).alias("embedding"),
        ),
        sidx,
        k=4,
    )
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {
                    "dedup-index-path": didx,
                    "semantic-index-path": sidx,
                    "semantic-dims": "16",
                    "ingest-checkpoint": "reliable",
                    "ingest-checkpoint-dir": ckpt,
                }
            }
        }
    )
    n_sem0 = spark.read.parquet(f"{sidx}/members").count()
    handle = curation_ingest_sink(cfg, out)
    handle(batches[1], 1)
    handle(batches[2].unionByName(batches[1].limit(1)), 2)

    sunk = spark.read.parquet(out)
    assert sunk.count() == sunk.select("doc_id").distinct().count()
    # BOTH standing indexes grew — the survivors frame was not
    # recomputed-to-empty mid-loop (the r9 bug the checkpoint guards)
    assert spark.read.parquet(f"{sidx}/members").count() > n_sem0
    assert os.path.isdir(ckpt) and os.listdir(ckpt)  # really reliable


def test_ingest_reliable_checkpoint_needs_dir(spark, sf_dir, tmp_path):
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"ingest-checkpoint": "reliable"}
            }
        }
    )
    handle = curation_ingest_sink(cfg, str(tmp_path / "o"))
    docs = _batches(spark, sf_dir)[0]
    if spark.sparkContext.getCheckpointDir() is None:
        with pytest.raises(ValueError, match="ingest-checkpoint-dir"):
            handle(docs, 0)
