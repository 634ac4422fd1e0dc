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


def test_replayed_batch_is_skipped_by_ledger(spark, sf_dir, tmp_path):
    """Structured Streaming's at-least-once foreachBatch redelivers a
    COMMITTED batch with the same batch_id (e.g. driver restart
    replaying from the stream checkpoint).  The batch-id ledger (r11
    — VERDICT r10 #9) must make that a whole-batch no-op: output rows,
    text-index stats, and BM25 SCORES bit-identical before/after the
    replay — scores are the one place where a re-append would not
    just duplicate storage but change answers."""
    import json as _json

    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import bm25_topk, write_text_index

    out = str(tmp_path / "out")
    tidx = str(tmp_path / "tidx")
    batches = _batches(spark, sf_dir)
    write_text_index(batches[0], tidx)
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"text-index-path": tidx}
            }
        }
    )
    handle = curation_ingest_sink(cfg, out)
    handle(batches[1], 1)

    def _state():
        rows = spark.read.parquet(out).count()
        stats = _json.loads(open(f"{tidx}/_stats.json").read())
        top = [
            (r["doc"], round(r["score"], 9))
            for r in bm25_topk(
                spark, tidx, "the data stream pipeline", k=10
            ).collect()
        ]
        return rows, stats, top

    before = _state()
    # redelivery: SAME batch id, same data — must be skipped whole
    handle(batches[1], 1)
    assert _state() == before
    # the ledger recorded the commit under the (default) ledger id
    assert os.path.exists(f"{out}/_ingest_ledger/default-batch-1")
    # a FRESH batch id still flows normally
    handle(batches[2], 2)
    after2 = spark.read.parquet(out).count()
    assert after2 > before[0]
    # a NEW logical stream over the same out_path scopes its own
    # ledger id, so its restarted batch ids are NOT shadowed
    cfg2 = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {
                    "text-index-path": tidx,
                    "ingest-ledger-id": "stream2",
                }
            }
        }
    )
    handle2 = curation_ingest_sink(cfg2, out)
    handle2(batches[3], 1)  # id 1 again — different ledger id
    assert spark.read.parquet(out).count() > after2
    assert os.path.exists(f"{out}/_ingest_ledger/stream2-batch-1")


def test_replayed_batch_crash_window_text_scores(spark, sf_dir, tmp_path):
    """The residual duplicate bound (module docstring): a batch that
    crashed AFTER its text-index append but BEFORE its ledger commit
    re-appends on retry.  Pin precisely what that does to the index:
    the replayed docs' tf and df double and n_docs counts them twice
    — so their BM25 term scores CHANGE (not merely duplicate rows),
    and compaction does NOT undo it (postings are count rows, not
    keyed fingerprints).  This is the documented crash-window bound;
    the upstream guard is the ledger + the dedup-index probe, and the
    REPAIR (r12 — VERDICT r11 #7) is ``reindex_docs``: remove every
    instance of the hit batch's docs and re-append once — pinned below
    to restore scores EQUAL to a from-scratch index."""
    import json as _json

    from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import (
        compact_text_index,
        reindex_docs,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import (
        append_to_text_index,
        write_text_index,
    )

    tidx = str(tmp_path / "tidx")
    batches = _batches(spark, sf_dir)
    write_text_index(batches[0], tidx)
    stats0 = _json.loads(open(f"{tidx}/_stats.json").read())
    append_to_text_index(batches[1], tidx)
    stats1 = _json.loads(open(f"{tidx}/_stats.json").read())
    n_b1 = batches[1].count()
    assert stats1["n_docs"] == stats0["n_docs"] + n_b1

    one_doc = batches[1].orderBy("doc_id").limit(1)
    doc_id = one_doc.first()["doc_id"]
    postings = spark.read.parquet(f"{tidx}/postings")
    tf_before = {
        r["term"]: r["tf"]
        for r in postings.filter(F.col("doc") == doc_id).collect()
    }
    # the crash-window replay: the SAME batch appended again
    append_to_text_index(batches[1], tidx)
    stats2 = _json.loads(open(f"{tidx}/_stats.json").read())
    # n_docs counts the replayed docs twice (exact bound, no more)
    assert stats2["n_docs"] == stats1["n_docs"] + n_b1
    postings = spark.read.parquet(f"{tidx}/postings")
    tf_after = (
        postings.filter(F.col("doc") == doc_id)
        .groupBy("term")
        .agg(F.sum("tf").alias("tf"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # every (term, doc) posting exists exactly twice with equal tf —
    # summed tf (what scoring aggregates) is exactly 2× the true count
    assert {r["term"]: r["n"] for r in tf_after} == {
        t: 2 for t in tf_before
    }
    assert {r["term"]: r["tf"] for r in tf_after} == {
        t: 2 * tf for t, tf in tf_before.items()
    }
    # compaction does NOT repair it: postings are per-(term, doc)
    # COUNT rows, not keyed fingerprints — the doubled mass persists
    compact_text_index(spark, tidx)
    tf_compacted = (
        spark.read.parquet(f"{tidx}/postings")
        .filter(F.col("doc") == doc_id)
        .groupBy("term")
        .agg(F.sum("tf").alias("tf"))
        .collect()
    )
    assert {r["term"]: r["tf"] for r in tf_compacted} == {
        t: 2 * tf for t, tf in tf_before.items()
    }
    # --- the r12 repair: reindex the hit batch's docs ---
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import bm25_topk

    report = reindex_docs(spark, tidx, batches[1])
    assert report["docs_repaired"] == n_b1
    assert report["instances_removed"] == 2 * n_b1
    assert report["reappended"]
    # stats back to the exact single-append state
    stats3 = _json.loads(open(f"{tidx}/_stats.json").read())
    assert stats3["n_docs"] == stats1["n_docs"]
    assert abs(stats3["avgdl"] - stats1["avgdl"]) < 1e-6
    # every (term, doc) posting of the repaired doc exists once, at
    # the original tf
    tf_repaired = {
        r["term"]: (r["tf"], r["n"])
        for r in spark.read.parquet(f"{tidx}/postings")
        .filter(F.col("doc") == doc_id)
        .groupBy("term")
        .agg(F.sum("tf").alias("tf"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert tf_repaired == {t: (tf, 1) for t, tf in tf_before.items()}
    # and BM25 scores equal a from-scratch index over the same corpus
    scratch = str(tmp_path / "scratch_tidx")
    write_text_index(batches[0].unionByName(batches[1]), scratch)
    q = "the data stream pipeline design"
    got = {
        r["doc"]: round(r["score"], 6)
        for r in bm25_topk(spark, tidx, q, k=25).collect()
    }
    want = {
        r["doc"]: round(r["score"], 6)
        for r in bm25_topk(spark, scratch, q, k=25).collect()
    }
    assert got == want
    # no marker left armed
    assert not os.path.exists(f"{tidx}/_maintenance_inprogress.json")


def test_ingest_ledger_retention_bounds_file_count(spark, sf_dir, tmp_path):
    """r12 (VERDICT r11 wrong #3): the ledger must not grow one file
    per micro-batch forever.  With ingest-ledger-keep = N, entries
    older than N batches are pruned every N commits, bounding the
    steady-state count to [N, 2N]; other lineages' entries are never
    touched."""
    out = str(tmp_path / "out")
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"ingest-ledger-keep": "4"}
            }
        }
    )
    handle = curation_ingest_sink(cfg, out)
    docs = spark.createDataFrame(
        [(i, f"some unique document text number {i} " * 8)
         for i in range(13)],
        "doc_id long, text string",
    )
    for i in range(1, 13):
        handle(docs.filter(F.col("doc_id") == i), i)
    # a foreign lineage's entry must survive pruning
    os.makedirs(f"{out}/_ingest_ledger", exist_ok=True)
    with open(f"{out}/_ingest_ledger/stream9-batch-1", "w") as fh:
        fh.write("{}")
    handle(docs.filter(F.col("doc_id") == 0), 16)  # 16 % 4 == 0: prune
    entries = sorted(os.listdir(f"{out}/_ingest_ledger"))
    ours = [e for e in entries if e.startswith("default-batch-")]
    ids = sorted(int(e.rsplit("-", 1)[1]) for e in ours)
    # everything below 16 - 4 = 12 is gone; the recent tail remains
    assert ids == [12, 16]
    assert "stream9-batch-1" in entries
    # bounded: never more than 2*keep of our lineage's entries
    assert len(ours) <= 8


def test_ingest_ledger_off_mode(spark, sf_dir, tmp_path):
    """corpus.ingest-ledger = off falls back to plain at-least-once:
    a redelivered batch re-appends (the pre-r11 behavior), and no
    ledger entries are written."""
    out = str(tmp_path / "out")
    batches = _batches(spark, sf_dir)
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"ingest-ledger": "off"}
            }
        }
    )
    handle = curation_ingest_sink(cfg, out)
    handle(batches[1], 1)
    n1 = spark.read.parquet(out).count()
    handle(batches[1], 1)  # replay is NOT suppressed in off mode
    assert spark.read.parquet(out).count() == 2 * n1
    assert not os.path.exists(f"{out}/_ingest_ledger")
    with pytest.raises(ValueError, match="ingest-ledger"):
        curation_ingest_sink(
            load_config(
                {
                    "keyspaces-cdc-streams": {
                        "corpus": {"ingest-ledger": "maybe"}
                    }
                }
            ),
            out,
        )


def test_ingest_ledger_startup_prune_new_id_and_off_boundary(
    spark, tmp_path
):
    """r13 (VERDICT r12 #8): a lineage that crashes short of a prune
    boundary and restarts under a NEW ledger-id must not strand the
    old id's files forever.  The one-time startup prune clears (a)
    foreign entries older than ingest-ledger-foreign-ttl and (b) this
    lineage's own off-boundary tail — while FRESH foreign entries
    (a live sibling stream) survive.

    Age is simulated by backdating entry mtimes with ``os.utime``
    (the startup prune reads file modification time), not wall-clock
    sleeps: with a 1-second TTL the two real Spark micro-batches
    between writing an entry and asserting on it could legitimately
    exceed the TTL on a slow host and prune a "fresh" sibling (r14
    driver flake).  The 300 s TTL is far above any plausible test
    execution time, and backdating by 1000 s is far beyond it."""
    import time

    out = str(tmp_path / "out")
    docs = spark.createDataFrame(
        [(i, f"some unique document text number {i} " * 8)
         for i in range(20)],
        "doc_id long, text string",
    )
    # lineage A: commits batches 1..6 with keep=4 — the modulo prune
    # at batch 4 cleared nothing (4-4=0), so entries 1..6 remain
    cfg_a = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"ingest-ledger-keep": "4",
                          "ingest-ledger-id": "streamA"}
            }
        }
    )
    handle_a = curation_ingest_sink(cfg_a, out)
    for i in range(1, 7):
        handle_a(docs.filter(F.col("doc_id") == i), i)
    a_before = [
        e for e in os.listdir(f"{out}/_ingest_ledger")
        if e.startswith("streamA-")
    ]
    assert len(a_before) == 6
    # backdate A's entries (and their .crc shadows) 1000 s into the
    # past — well past the 300 s TTL below — so A reads as dead
    # residue regardless of how long this test actually runs
    aged = time.time() - 1000.0
    for e in os.listdir(f"{out}/_ingest_ledger"):
        if "streamA-" in e:
            os.utime(f"{out}/_ingest_ledger/{e}", (aged, aged))
    # lineage B restarts over the same output path with ttl=300s: A is
    # dead residue and must be fully cleared on B's FIRST batch; a
    # fresh foreign entry (live sibling C) must survive
    with open(f"{out}/_ingest_ledger/streamC-batch-3", "w") as fh:
        fh.write("{}")
    cfg_b = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"ingest-ledger-keep": "4",
                          "ingest-ledger-id": "streamB",
                          "ingest-ledger-foreign-ttl": "300"}
            }
        }
    )
    handle_b = curation_ingest_sink(cfg_b, out)
    handle_b(docs.filter(F.col("doc_id") == 10), 1)
    entries = sorted(os.listdir(f"{out}/_ingest_ledger"))
    assert not any(e.startswith("streamA-") for e in entries)
    assert "streamC-batch-3" in entries
    assert "streamB-batch-1" in entries
    # own off-boundary tail: a restart of B from batch 101 (101 % 4
    # != 0 — the modulo prune would never fire near it) clears
    # everything below 101 - keep on the first batch
    handle_b2 = curation_ingest_sink(cfg_b, out)
    handle_b2(docs.filter(F.col("doc_id") == 11), 101)
    b_ids = sorted(
        int(e.rsplit("-", 1)[1])
        for e in os.listdir(f"{out}/_ingest_ledger")
        if e.startswith("streamB-")
    )
    assert b_ids == [101]  # batch 1 < 101-4: startup-pruned
    # foreign-ttl = 0 disables foreign pruning entirely: backdate the
    # surviving B and C entries far past ANY positive TTL and show a
    # ttl=0 lineage still leaves them alone
    cfg_d = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"ingest-ledger-id": "streamD",
                          "ingest-ledger-foreign-ttl": "0"}
            }
        }
    )
    for e in os.listdir(f"{out}/_ingest_ledger"):
        if "streamB-" in e or "streamC-" in e:
            os.utime(f"{out}/_ingest_ledger/{e}", (aged, aged))
    handle_d = curation_ingest_sink(cfg_d, out)
    handle_d(docs.filter(F.col("doc_id") == 12), 1)
    entries = os.listdir(f"{out}/_ingest_ledger")
    assert "streamC-batch-3" in entries and any(
        e.startswith("streamB-") for e in entries
    )
    with pytest.raises(ValueError, match="foreign-ttl"):
        curation_ingest_sink(
            load_config(
                {
                    "keyspaces-cdc-streams": {
                        "corpus": {"ingest-ledger-foreign-ttl": "-1"}
                    }
                }
            ),
            out,
        )
