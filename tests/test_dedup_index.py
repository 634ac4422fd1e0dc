"""Incremental cross-corpus dedup index: exact + minhash suppression,
idempotent ingest via append, untouched-file contract, and the
keys-only shuffle plan."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import (
    append_to_dedup_index,
    build_dedup_index,
    dedup_against_index,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "it was a bright cold day in april and the clocks were striking"),
    (3, "many years later the colonel remembered that distant afternoon well"),
]
BATCH = [
    # exact copy of corpus doc 1
    (101, "the quick brown fox jumps over the lazy dog near the river bank"),
    # whitespace/case variant of doc 2 (same normalized fingerprint)
    (102, "  It was a BRIGHT cold day in april and the clocks were striking "),
    # genuinely new
    (103, "a completely novel document about distributed query processing"),
    (104, "another fresh article on columnar storage and vectorized scans"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def batch(spark):
    return spark.createDataFrame(BATCH, "doc_id long, text string").cache()


def test_exact_index_suppresses_known_docs(spark, corpus, batch, tmp_path):
    path = str(tmp_path / "idx")
    build_dedup_index(corpus, path, mode="exact")
    fresh = dedup_against_index(batch, path, mode="exact")
    ids = sorted(r["doc_id"] for r in fresh.select("doc_id").collect())
    assert ids == [103, 104]
    assert "fp" not in fresh.columns


def test_ingest_is_idempotent_after_append(spark, corpus, batch, tmp_path):
    path = str(tmp_path / "idx")
    build_dedup_index(corpus, path, mode="exact")
    fresh = dedup_against_index(batch, path, mode="exact", keep_key=True)
    assert "fp" in fresh.columns
    append_to_dedup_index(fresh, path, mode="exact")
    again = dedup_against_index(batch, path, mode="exact")
    assert again.count() == 0  # the whole batch is now known


def test_append_never_rewrites_existing_files(spark, corpus, batch, tmp_path):
    path = str(tmp_path / "idx")
    build_dedup_index(corpus, path, mode="exact")

    def snapshot():
        return {
            f: os.path.getmtime(f)
            for f in glob.glob(
                os.path.join(path, "exact", "**", "*.parquet"), recursive=True
            )
        }

    before = snapshot()
    fresh = dedup_against_index(batch, path, mode="exact", keep_key=True)
    append_to_dedup_index(fresh, path, mode="exact")
    after = snapshot()
    assert set(before) <= set(after)  # old files still present
    for f, mtime in before.items():
        assert after[f] == mtime  # and untouched
    assert len(after) > len(before)  # new files appended


def test_minhash_index_catches_near_identical(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    build_dedup_index(corpus, path, mode="minhash")
    probe = corpus.sparkSession.createDataFrame(
        [
            # identical shingle set to doc 1 -> identical signature
            (201, "  THE quick brown fox jumps over the lazy dog near the river bank"),
            (202, "totally unrelated content about spark physical planning"),
        ],
        "doc_id long, text string",
    )
    fresh = dedup_against_index(probe, path, mode="minhash")
    ids = [r["doc_id"] for r in fresh.select("doc_id").collect()]
    assert ids == [202]


def test_invalid_mode_rejected(spark, corpus, tmp_path):
    with pytest.raises(ValueError):
        build_dedup_index(corpus, str(tmp_path / "x"), mode="fuzzy")


def test_anti_join_shuffles_keys_only(spark, sf_dir, tmp_path, corpus):
    """No Exchange in the dedup plan may carry the text column — the
    batch's text must stay columnar-pruned until the final id
    re-join (which AQE broadcasts)."""
    path = str(tmp_path / "idx")
    build_dedup_index(corpus, path, mode="exact")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fresh = dedup_against_index(docs, path, mode="exact")
    # formatted explain lists each node's full Output — assert no
    # Exchange emits the text column
    plan = fresh._sc._jvm.PythonSQLUtils.explainString(
        fresh._jdf.queryExecution(), "formatted"
    )
    import re

    blocks = re.split(r"\n\(\d+\) ", plan)
    for b in blocks:
        if b.startswith("Exchange"):
            out_line = [l for l in b.splitlines() if l.startswith("Input")]
            assert out_line and "text" not in out_line[0], b.splitlines()[0]
    # and the result is correct: none of the sf docs are in the corpus
    assert fresh.count() == docs.count()


def test_duplicate_batch_ids_do_not_multiply(spark, corpus, tmp_path):
    """A batch carrying a repeated id keeps each ROW exactly once:
    the survivor-id frame is distinct-ed before the re-join, so the
    join cannot multiply rows (within-batch dedup is a separate
    stage and is NOT performed here — both copies survive)."""
    path = str(tmp_path / "idx")
    build_dedup_index(corpus, path, mode="exact")
    batch = spark.createDataFrame(
        [
            (301, "a brand new document about adaptive query execution"),
            (301, "a brand new document about adaptive query execution"),
            (302, "another new one about shuffle partition coalescing"),
        ],
        "doc_id long, text string",
    )
    fresh = dedup_against_index(batch, path, mode="exact")
    rows = fresh.collect()
    assert len(rows) == 3  # no join multiplication (2x2 would give 5)
    assert sorted(r["doc_id"] for r in rows) == [301, 301, 302]
