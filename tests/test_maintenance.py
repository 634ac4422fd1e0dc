"""Standing-index maintenance (llm/maintenance.py): compaction and
rebalancing pinned EQUIVALENT to from-scratch rebuilds, plus the
untouched-file and payload-preservation contracts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (
    append_to_ivf_index,
    ivf_index_topk,
    ivf_int8_topk,
    load_codebook,
    write_ivf_index,
    write_ivf_int8_index,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import (
    compact_text_index,
    rebalance_ivf_index,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import (
    _load_stats,
    append_to_text_index,
    bm25_topk,
    bm25_topk_many,
    write_text_index,
)

QUERY = "the quick brown data pipeline"


def _posting_files(path: str) -> dict[str, list[str]]:
    """bucket dir name -> its parquet file names (local-FS walk)."""
    out: dict[str, list[str]] = {}
    root = f"{path}/postings"
    for name in os.listdir(root):
        if name.startswith("tb=") and os.path.isdir(f"{root}/{name}"):
            out[name] = sorted(
                f
                for f in os.listdir(f"{root}/{name}")
                if f.endswith(".parquet")
            )
    return out


@pytest.fixture(scope="module")
def fragmented_index(spark, sf_dir, tmp_path_factory):
    """Index over ⅓ of documents + two appends covering the rest —
    fragmented buckets and three vocabulary segments."""
    path = str(tmp_path_factory.mktemp("compact") / "idx")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    write_text_index(docs.filter(F.col("doc_id") % 3 == 0), path)
    append_to_text_index(docs.filter(F.col("doc_id") % 3 == 1), path)
    append_to_text_index(docs.filter(F.col("doc_id") % 3 == 2), path)
    return path


def test_compact_scores_bit_identical(spark, sf_dir, fragmented_index, tmp_path):
    """Compaction is file-level only: single-query and bulk probes
    return BIT-identical (doc, score) lists before and after, and the
    post-compaction ranking equals a from-scratch rebuild's."""
    before = [
        (r["doc"], r["score"])
        for r in bm25_topk(spark, fragmented_index, QUERY, k=20).collect()
    ]
    report = compact_text_index(spark, fragmented_index)
    after = [
        (r["doc"], r["score"])
        for r in bm25_topk(spark, fragmented_index, QUERY, k=20).collect()
    ]
    assert after == before  # bit-identical: same rows, same stats
    assert report["buckets_compacted"] > 0
    assert report["vocab_segments_before"] == 3

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    full = str(tmp_path / "full")
    write_text_index(docs, full)
    want = [r["doc"] for r in bm25_topk(spark, full, QUERY, k=20).collect()]
    assert [d for d, _ in after] == want

    queries = spark.createDataFrame(
        [(1, QUERY), (2, "sort merge hash key")],
        "query_id long, query string",
    )
    got_bulk = {
        (r["query_id"], r["rank"]): r["doc"]
        for r in bm25_topk_many(
            spark, fragmented_index, queries, k=8
        ).collect()
    }
    want_bulk = {
        (r["query_id"], r["rank"]): r["doc"]
        for r in bm25_topk_many(spark, full, queries, k=8).collect()
    }
    assert got_bulk == want_bulk


def test_compact_merges_files_and_respects_untouched(spark, fragmented_index):
    """Fragmented buckets collapse to one file; buckets already at the
    threshold keep their EXACT file set (untouched-file contract);
    vocabulary collapses to one segment; stats unchanged."""
    stats0 = _load_stats(spark, fragmented_index)
    files0 = _posting_files(fragmented_index)
    # first compaction may have run in the other test (module fixture
    # shared) — force a fresh fragmented state check instead via a
    # second compaction: it must be a NO-OP on every already-single
    # bucket
    compact_text_index(spark, fragmented_index)
    files1 = _posting_files(fragmented_index)
    assert files1.keys() == files0.keys()
    for name, fl in files1.items():
        assert len(fl) == 1, f"{name} not compacted: {fl}"
    # idempotent second run: untouched-file contract = file NAMES
    # survive (no rewrite of single-file buckets), vocab stays single
    report = compact_text_index(spark, fragmented_index)
    assert report["buckets_compacted"] == 0
    assert report["vocab_segments_before"] == 1
    assert _posting_files(fragmented_index) == files1
    assert _load_stats(spark, fragmented_index) == stats0


def test_compact_files_per_bucket_fanout(spark, sf_dir, tmp_path):
    """files_per_bucket>1 splits each fragmented bucket into bounded
    files (the 100 TB knob: one file per bucket would be a giant)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "fan")
    write_text_index(docs.filter(F.col("doc_id") < 200), path, n_buckets=8)
    append_to_text_index(docs.filter(F.col("doc_id") >= 200), path)
    before = [
        (r["doc"], r["score"])
        for r in bm25_topk(spark, path, QUERY, k=10).collect()
    ]
    compact_text_index(spark, path, files_per_bucket=2)
    files = _posting_files(path)
    assert all(1 <= len(fl) <= 2 for fl in files.values())
    assert any(len(fl) == 2 for fl in files.values())
    after = [
        (r["doc"], r["score"])
        for r in bm25_topk(spark, path, QUERY, k=10).collect()
    ]
    assert after == before


def test_compact_validates(spark, fragmented_index):
    with pytest.raises(ValueError, match="max_files_per_bucket"):
        compact_text_index(spark, fragmented_index, max_files_per_bucket=0)
    with pytest.raises(ValueError, match="files_per_bucket"):
        compact_text_index(spark, fragmented_index, files_per_bucket=0)


# --- fingerprint dedup-index compaction (r10) --------------------------------


def _bucket_files(root: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for name in os.listdir(root):
        if name.startswith("bucket=") and os.path.isdir(f"{root}/{name}"):
            out[name] = sorted(
                f
                for f in os.listdir(f"{root}/{name}")
                if f.endswith(".parquet")
            )
    return out


def test_compact_dedup_index_survivors_identical(spark, sf_dir, tmp_path):
    """Probe-survivor equivalence: compaction changes file boundaries
    (and collapses duplicate keys), never the key SET; fragmented
    buckets merge to one file; already-single buckets keep their
    exact files (untouched-bucket contract); idempotent second run."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import (
        append_to_dedup_index,
        build_dedup_index,
        dedup_against_index,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import compact_dedup_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "didx")
    build_dedup_index(docs.filter(F.col("doc_id") % 3 == 0), path)
    append_to_dedup_index(docs.filter(F.col("doc_id") % 3 == 1), path)
    # a RE-append of the same slice plants duplicate fp rows — the
    # at-least-once batch-retry shape compaction must tolerate
    append_to_dedup_index(docs.filter(F.col("doc_id") % 3 == 1), path)
    append_to_dedup_index(docs.filter(F.col("doc_id") % 3 == 2), path)

    probe = docs.limit(400)
    before = {
        r["doc_id"]
        for r in dedup_against_index(probe, path).select("doc_id").collect()
    }
    files0 = _bucket_files(f"{path}/exact")
    assert any(len(fl) > 1 for fl in files0.values())  # fragmented
    report = compact_dedup_index(spark, path)
    assert report["buckets_compacted"] > 0
    files1 = _bucket_files(f"{path}/exact")
    assert files1.keys() == files0.keys()
    for name, fl in files1.items():
        if len(files0[name]) <= 1:
            assert fl == files0[name], f"untouched bucket rewritten: {name}"
        else:
            assert len(fl) == 1, (name, fl)
    after = {
        r["doc_id"]
        for r in dedup_against_index(probe, path).select("doc_id").collect()
    }
    assert after == before
    # duplicate keys collapsed: every (bucket, fp) is unique now
    idx = spark.read.parquet(f"{path}/exact")
    assert idx.count() == idx.distinct().count()
    # idempotent second run: a no-op that rewrites nothing
    report2 = compact_dedup_index(spark, path)
    assert report2["buckets_compacted"] == 0
    assert _bucket_files(f"{path}/exact") == files1


def test_compact_dedup_index_keeps_bloom_valid(spark, sf_dir, tmp_path):
    """Bloom sidecars are built from the key set, which compaction
    preserves — a filter built BEFORE compaction yields identical
    survivors after (no rebuild needed)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import (
        append_to_dedup_index,
        build_dedup_index,
        build_index_bloom,
        dedup_against_index,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import compact_dedup_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "didxb")
    build_dedup_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    append_to_dedup_index(docs.filter(F.col("doc_id") % 2 == 1), path)
    bloom = build_index_bloom(spark, path)
    probe = docs.limit(300)
    before = {
        r["doc_id"]
        for r in dedup_against_index(probe, path, bloom=bloom)
        .select("doc_id")
        .collect()
    }
    compact_dedup_index(spark, path)
    after = {
        r["doc_id"]
        for r in dedup_against_index(probe, path, bloom=bloom)
        .select("doc_id")
        .collect()
    }
    assert after == before


def test_compact_dedup_index_files_per_bucket_and_validation(
    spark, sf_dir, tmp_path
):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import (
        append_to_dedup_index,
        build_dedup_index,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import compact_dedup_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "didxf")
    build_dedup_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    append_to_dedup_index(docs.filter(F.col("doc_id") % 2 == 1), path)
    compact_dedup_index(spark, path, files_per_bucket=2)
    files = _bucket_files(f"{path}/exact")
    assert all(1 <= len(fl) <= 2 for fl in files.values())
    with pytest.raises(ValueError, match="max_files_per_bucket"):
        compact_dedup_index(spark, path, max_files_per_bucket=0)
    with pytest.raises(ValueError, match="files_per_bucket"):
        compact_dedup_index(spark, path, files_per_bucket=0)


# --- interrupted-swap detection (r10, review finding) -------------------------


def test_pending_swap_marker_blocks_every_loader(spark, sf_dir, tmp_path):
    """A maintenance op that crashes mid-swap leaves the marker on
    disk; every loader that interprets the layout must then refuse —
    silent wrong answers (stale codebook over a new cell layout, a
    bucket renamed aside but not replaced) are the failure mode."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import (
        build_dedup_index,
        dedup_against_index,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import MAINTENANCE_MARKER

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    vecs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(100)
    )

    tidx = str(tmp_path / "tidx")
    write_text_index(docs.limit(200), tidx)
    with open(f"{tidx}/{MAINTENANCE_MARKER}", "w") as fh:
        fh.write('{"op": "compact_text_index"}')
    with pytest.raises(RuntimeError, match="unfinished maintenance swap"):
        bm25_topk(spark, tidx, QUERY, k=5).collect()
    os.remove(f"{tidx}/{MAINTENANCE_MARKER}")
    assert bm25_topk(spark, tidx, QUERY, k=5).count() > 0

    vidx = str(tmp_path / "vidx")
    write_ivf_index(vecs, vidx, k=3)
    with open(f"{vidx}/{MAINTENANCE_MARKER}", "w") as fh:
        fh.write('{"op": "rebalance_ivf_index"}')
    with pytest.raises(RuntimeError, match="unfinished maintenance swap"):
        load_codebook(vidx, spark)
    os.remove(f"{vidx}/{MAINTENANCE_MARKER}")
    assert len(load_codebook(vidx, spark)) == 3

    didx = str(tmp_path / "didx")
    build_dedup_index(docs.limit(200), didx)
    with open(f"{didx}/exact/{MAINTENANCE_MARKER}", "w") as fh:
        fh.write('{"op": "compact_dedup_index"}')
    with pytest.raises(RuntimeError, match="unfinished maintenance swap"):
        dedup_against_index(docs.limit(10), didx).collect()
    os.remove(f"{didx}/exact/{MAINTENANCE_MARKER}")
    assert dedup_against_index(docs.limit(10), didx).count() == 0


def test_maintenance_clears_marker_and_old_dirs(spark, sf_dir, tmp_path):
    """Completed maintenance leaves neither the marker nor any
    '.__old' aside directory behind (the aside-rename swap's garbage
    is deleted last), and stale aside garbage from a previous crash
    is cleared by the next run."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import MAINTENANCE_MARKER

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "tidx")
    write_text_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    append_to_text_index(docs.filter(F.col("doc_id") % 2 == 1), path)
    # plant stale aside garbage as a crashed swap would leave it
    victim = next(iter(_posting_files(path)))
    os.makedirs(f"{path}/postings/{victim}.__old", exist_ok=True)
    compact_text_index(spark, path)
    names = set(os.listdir(f"{path}/postings"))
    assert not any(n.endswith(".__old") for n in names)
    assert MAINTENANCE_MARKER not in set(os.listdir(path))
    assert not any("tmp" in n for n in names)


# --- IVF rebalance -----------------------------------------------------------


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(450)
    )


def test_rebalance_equals_from_scratch_rebuild(spark, vectors, tmp_path):
    """Reproducible-training mode: after two appends, rebalance's
    codebook, per-cell membership, and probe (docs AND scores) are
    IDENTICAL to a from-scratch write_ivf_index over the same rows."""
    grown = str(tmp_path / "grown")
    a = vectors.filter(F.col("vec_id") % 3 == 0)
    b = vectors.filter(F.col("vec_id") % 3 == 1)
    c = vectors.filter(F.col("vec_id") % 3 == 2)
    write_ivf_index(a, grown, k=6, exact_means=True, tol=None)
    append_to_ivf_index(b, grown)
    append_to_ivf_index(c, grown)

    fresh = str(tmp_path / "fresh")
    write_ivf_index(vectors, fresh, k=6, exact_means=True, tol=None)
    got_cb = rebalance_ivf_index(
        spark, grown, exact_means=True, tol=None
    )
    want_cb = load_codebook(fresh, spark)
    assert got_cb == want_cb  # bit-identical centroids

    cells_got = {
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(grown).select("vec_id", "cell").collect()
    }
    cells_want = {
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(fresh).select("vec_id", "cell").collect()
    }
    assert cells_got == cells_want

    q = [r["embedding"] for r in vectors.limit(1).collect()][0]
    got = [
        (r["vec_id"], r["sim"])
        for r in ivf_index_topk(spark, grown, q, topk=10, n_probe=2).collect()
    ]
    want = [
        (r["vec_id"], r["sim"])
        for r in ivf_index_topk(spark, fresh, q, topk=10, n_probe=2).collect()
    ]
    assert got == want


def test_rebalance_preserves_int8_payload(spark, vectors, tmp_path):
    """An int8 layout keeps its q_scale/q_code through rebalance
    (codes are cell-independent); all-cell probes return the same
    results before/after (nothing lost or duplicated), and cell files
    defragment."""
    path = str(tmp_path / "i8")
    a = vectors.filter(F.col("vec_id") % 2 == 0)
    b = vectors.filter(F.col("vec_id") % 2 == 1)
    write_ivf_int8_index(a, path, k=5)
    append_to_ivf_index(b, path)
    q = [r["embedding"] for r in vectors.limit(1).collect()][0]
    # n_probe = k probes every cell -> result independent of clustering
    before = [
        (r["vec_id"], round(r["score"], 9))
        for r in ivf_int8_topk(spark, path, q, topk=10, n_probe=5).collect()
    ]
    rebalance_ivf_index(spark, path, k=5)
    rows = spark.read.parquet(path)
    assert {"vec_id", "embedding", "q_scale", "q_code", "cell"} <= set(
        rows.columns
    )
    assert rows.count() == vectors.count()
    after = [
        (r["vec_id"], round(r["score"], 9))
        for r in ivf_int8_topk(spark, path, q, topk=10, n_probe=5).collect()
    ]
    assert after == before
    # defrag: one file per cell directory
    for name in os.listdir(path):
        if name.startswith("cell="):
            files = [
                f
                for f in os.listdir(f"{path}/{name}")
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, (name, files)
    assert len(load_codebook(path, spark)) == 5


def test_rebalance_can_grow_k(spark, vectors, tmp_path):
    """Passing a larger k re-cells the index (the corpus-outgrew-its-
    cell-count path); probe answers at full n_probe stay exact."""
    path = str(tmp_path / "grow")
    write_ivf_index(vectors.filter(F.col("vec_id") % 2 == 0), path, k=3)
    append_to_ivf_index(vectors.filter(F.col("vec_id") % 2 == 1), path)
    q = [r["embedding"] for r in vectors.limit(1).collect()][0]
    before = [
        (r["vec_id"], round(r["sim"], 9))
        for r in ivf_index_topk(spark, path, q, topk=8, n_probe=3).collect()
    ]
    cb = rebalance_ivf_index(spark, path, k=9)
    assert len(cb) == 9
    cells = sorted(
        r["cell"]
        for r in spark.read.parquet(path).select("cell").distinct().collect()
    )
    assert len(cells) >= 4  # genuinely re-celled
    after = [
        (r["vec_id"], round(r["sim"], 9))
        for r in ivf_index_topk(spark, path, q, topk=8, n_probe=9).collect()
    ]
    assert after == before


# --- semantic-index rebalance ------------------------------------------------


def _suppressed_ids(spark, batch, path, eps):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import semantic_dedup_against_index

    fresh = {
        r["vec_id"]
        for r in semantic_dedup_against_index(batch, path, eps=eps)
        .select("vec_id")
        .collect()
    }
    return {r["vec_id"] for r in batch.select("vec_id").collect()} - fresh


@pytest.mark.parametrize("int8", [False, True])
def test_rebalance_semantic_index(spark, vectors, tmp_path, int8):
    """After appends + rebalance: payload preserved (float nv / int8
    codes verbatim), cells re-derived through the probe's own
    assignment kernel (exact-copy probes of members are ALWAYS
    suppressed — the cos=1 pair shares a cell by construction), files
    defragmented, codebook grown on request."""
    import os

    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import load_codebook
    from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import rebalance_semantic_index
    from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import (
        append_to_semantic_index,
        write_semantic_index,
    )

    path = str(tmp_path / ("sem8" if int8 else "semf"))
    a = vectors.filter(F.col("vec_id") % 2 == 0)
    b = vectors.filter(F.col("vec_id") % 2 == 1)
    write_semantic_index(a, path, k=4, int8=int8)
    append_to_semantic_index(b, path)
    members_before = spark.read.parquet(f"{path}/members")
    cols_before = set(members_before.columns)
    if int8:
        payload_before = {
            r["vec_id"]: (r["q_scale"], tuple(r["q_code"]))
            for r in members_before.collect()
        }
    else:
        payload_before = {
            r["vec_id"]: tuple(r["nv"]) for r in members_before.collect()
        }

    cb = rebalance_semantic_index(spark, path, k=6)
    assert len(cb) == 6
    assert len(load_codebook(path, spark)) == 6
    members = spark.read.parquet(f"{path}/members")
    assert set(members.columns) == cols_before
    if int8:
        payload_after = {
            r["vec_id"]: (r["q_scale"], tuple(r["q_code"]))
            for r in members.collect()
        }
    else:
        payload_after = {
            r["vec_id"]: tuple(r["nv"]) for r in members.collect()
        }
    assert payload_after == payload_before  # codes/nv verbatim
    # exact copies of 20 members must all be suppressed post-rebalance
    # (an exact copy lands in its member's cell by construction; the
    # int8 index's dequantized dot is 1 ± ~1e-2, so its eps is looser
    # — the documented approximate-threshold contract)
    probe = vectors.filter(F.col("vec_id") % 7 == 0).limit(20)
    eps = 0.95 if int8 else 0.999
    assert _suppressed_ids(spark, probe, path, eps) == {
        r["vec_id"] for r in probe.select("vec_id").collect()
    }
    # defrag: one file per cell
    for name in os.listdir(f"{path}/members"):
        if name.startswith("cell="):
            files = [
                f
                for f in os.listdir(f"{path}/members/{name}")
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, (name, files)


def test_rebalance_semantic_index_preserves_duplicate_ids(
    spark, vectors, tmp_path
):
    """The documented re-append hazard: duplicate member ids must ride
    through rebalance row-for-row — the old id self-join relabel
    cross-multiplied them (n² rows per duplicated id), silently
    growing the index (r10 review finding)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import rebalance_semantic_index
    from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import (
        append_to_semantic_index,
        write_semantic_index,
    )

    path = str(tmp_path / "semdup")
    sub = vectors.limit(60)
    write_semantic_index(sub, path, k=3)
    # re-append the SAME rows: every id now appears twice
    append_to_semantic_index(sub, path)
    assert spark.read.parquet(f"{path}/members").count() == 120
    rebalance_semantic_index(spark, path, k=3)
    assert spark.read.parquet(f"{path}/members").count() == 120


def test_compact_dedup_index_skips_zero_row_bucket(spark, sf_dir, tmp_path):
    """A fragmented bucket whose files all hold ZERO rows produces no
    partition directory in the compaction's tmp output; the swap must
    SKIP it (its empty fragments contribute no keys) rather than
    rename the live bucket aside with no replacement — which would
    strand the index with the maintenance marker armed (r11, ADVICE
    r10).  r12 (ADVICE r11): the skip also DELETES the zero-row
    bucket's fragment files, so it stops re-qualifying as fragmented
    on every later run (``buckets_skipped_empty`` converges to 0).
    Other fragmented buckets still compact normally."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import (
        append_to_dedup_index,
        build_dedup_index,
        dedup_against_index,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import compact_dedup_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "didx")
    build_dedup_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    append_to_dedup_index(docs.filter(F.col("doc_id") % 2 == 1), path)
    # plant a fragmented bucket made ONLY of zero-row files (an empty
    # batch's append shape): 2 empty part files under a fresh bucket
    empty = spark.createDataFrame([], "fp string").repartition(1)
    for _ in range(2):
        empty.write.mode("append").parquet(f"{path}/exact/bucket=zz")
    probe = docs.limit(300)
    before = {
        r["doc_id"]
        for r in dedup_against_index(probe, path).select("doc_id").collect()
    }
    report = compact_dedup_index(spark, path)
    assert report["buckets_compacted"] > 0
    # the zero-row bucket is counted as SKIPPED, not compacted (r11:
    # the skip must not overstate the work done)
    assert report["buckets_skipped_empty"] == 1
    # no armed marker, no stranded bucket: probes run and match
    after = {
        r["doc_id"]
        for r in dedup_against_index(probe, path).select("doc_id").collect()
    }
    assert after == before
    # the zero-row bucket's fragments are GONE (a zero-row bucket
    # reads identically with or without its directory), so a second
    # compaction finds nothing empty left to skip
    import os as _os

    assert not _os.path.exists(f"{path}/exact/bucket=zz")
    assert not _os.path.exists(
        f"{path}/exact/_maintenance_inprogress.json"
    )
    report2 = compact_dedup_index(spark, path)
    assert report2["buckets_skipped_empty"] == 0


def test_reindex_discovery_is_bucket_pruned(spark, sf_dir, tmp_path):
    """r13 (VERDICT r12 #4): reindex_docs derives the affected term
    buckets from the docs' OWN text and pushes them as PARTITION
    filters into both the discovery and rewrite scans — the repair
    reads O(affected buckets), never O(index)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import (
        _affected_postings,
        reindex_docs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "tidx")
    write_text_index(docs, path, n_buckets=16)
    # the pruned reader both reindex scans go through: tb is the
    # partitionBy column, so the isin lands as a PartitionFilter on
    # the file listing (not a post-scan Filter)
    plan = (
        _affected_postings(spark, f"{path}/postings", [3, 7])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan = [l for l in plan.splitlines() if "FileScan parquet" in l][0]
    assert "PartitionFilters" in scan and "tb" in scan.split(
        "PartitionFilters", 1
    )[1]
    # a one-doc repair leaves every unaffected bucket's FILES untouched
    # (names identical — no rewrite, not merely equal rows)
    one = docs.orderBy("doc_id").limit(1)
    append_to_text_index(one.withColumn("doc_id", F.col("doc_id") + 10**9)
                         .withColumn("doc_id", F.col("doc_id") - 10**9), path)
    files_before = _posting_files(path)
    report = reindex_docs(spark, path, one)
    assert 0 < report["buckets_rewritten"] < 16
    files_after = _posting_files(path)
    rewritten = {
        b for b in files_before
        if files_after.get(b) != files_before[b]
    }
    # only the affected buckets changed (reappend adds fragments to
    # the same affected buckets, so the change set is bounded by them)
    assert len(rewritten) <= report["buckets_rewritten"]


def test_reindex_crash_mid_swap_resumes_from_staged_state(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r13 (ADVICE r12 medium): a crash at ANY point of the
    destructive phase leaves the marker armed with the full completion
    recipe; the next reindex_docs call rolls the torn repair forward
    from the STAGED state (never recomputing df/stats from half-swapped
    postings) and then performs its own work — final index equals a
    from-scratch build, marker cleared."""
    import json as _json

    from sample_keyspaces_cdc_streams_connectors_spark.llm import maintenance as M

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 60)
    batch = docs.filter(F.col("doc_id") >= 40)
    path = str(tmp_path / "tidx")
    write_text_index(docs.filter(F.col("doc_id") < 40), path, n_buckets=8)
    append_to_text_index(batch, path)
    append_to_text_index(batch, path)  # the crash-window replay

    # crash after the FIRST bucket swap of the destructive phase
    real_swap = M._swap_dir
    calls = {"n": 0}

    def exploding_swap(spark_, repl, live):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash mid-swap")
        real_swap(spark_, repl, live)

    monkeypatch.setattr(M, "_swap_dir", exploding_swap)
    with pytest.raises(RuntimeError, match="injected crash"):
        M.reindex_docs(spark, path, batch)
    monkeypatch.setattr(M, "_swap_dir", real_swap)
    # the marker is armed WITH the completion recipe; probes refuse
    marker = _json.loads(
        open(f"{path}/_maintenance_inprogress.json").read()
    )
    assert marker["op"] == "reindex_docs"
    assert marker["n_remove"] > 0 and "stats" in marker
    with pytest.raises(RuntimeError, match="unfinished maintenance"):
        bm25_topk(spark, path, QUERY, k=5).collect()
    # the standard recovery: re-run the same repair.  It first
    # finishes the torn removal from the staged state, finds nothing
    # left to remove, and reappends exactly once.
    report = M.reindex_docs(spark, path, batch)
    assert report["reappended"]
    assert not os.path.exists(f"{path}/_maintenance_inprogress.json")
    scratch = str(tmp_path / "scratch")
    write_text_index(docs, scratch, n_buckets=8)
    got = {
        (r["doc"], round(r["score"], 6))
        for r in bm25_topk(spark, path, QUERY, k=25).collect()
    }
    want = {
        (r["doc"], round(r["score"], 6))
        for r in bm25_topk(spark, scratch, QUERY, k=25).collect()
    }
    assert got == want
    st = _load_stats(spark, path)
    st2 = _load_stats(spark, scratch)
    assert st["n_docs"] == st2["n_docs"]
    assert abs(st["avgdl"] - st2["avgdl"]) < 1e-9


def test_reindex_crash_before_stats_write_cannot_lock_index(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r13 (ADVICE r12 medium, second arm): a crash BETWEEN the vocab
    delta move and the stats write used to strand the marker forever
    (re-run found n_remove == 0 and skipped both the stats fix and the
    marker clear).  Now the stats come from the marker recipe, so the
    resume completes and unlocks."""
    import json as _json

    from sample_keyspaces_cdc_streams_connectors_spark.llm import maintenance as M
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import _write_text as real_wt

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 30)
    batch = docs.filter(F.col("doc_id") >= 20)
    path = str(tmp_path / "tidx")
    write_text_index(docs.filter(F.col("doc_id") < 20), path, n_buckets=8)
    append_to_text_index(batch, path)
    append_to_text_index(batch, path)

    # crash exactly at the stats rewrite inside the destructive phase
    stats_path = f"{path}/_stats.json"

    # the repair's own stats write carries n_docs == 20 (40 minus the
    # 2×10 removed instances); the reappend's later write carries 30
    def exploding_wt(spark_, p, text):
        if p == stats_path and _json.loads(text)["n_docs"] == 20:
            raise RuntimeError("injected crash at stats write")
        real_wt(spark_, p, text)

    import sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index as ivf_mod

    monkeypatch.setattr(ivf_mod, "_write_text", exploding_wt)
    with pytest.raises(RuntimeError, match="injected crash"):
        M.reindex_docs(spark, path, batch)
    monkeypatch.setattr(ivf_mod, "_write_text", real_wt)
    assert os.path.exists(f"{path}/_maintenance_inprogress.json")
    # re-run unlocks: removal already complete on disk, stats come
    # from the marker, reappend runs once
    report = M.reindex_docs(spark, path, batch)
    assert report["instances_removed"] == 0  # staged removal was done
    assert report["reappended"]
    assert not os.path.exists(f"{path}/_maintenance_inprogress.json")
    scratch = str(tmp_path / "scratch")
    write_text_index(docs, scratch, n_buckets=8)
    got = {
        (r["doc"], round(r["score"], 6))
        for r in bm25_topk(spark, path, QUERY, k=25).collect()
    }
    want = {
        (r["doc"], round(r["score"], 6))
        for r in bm25_topk(spark, scratch, QUERY, k=25).collect()
    }
    assert got == want
