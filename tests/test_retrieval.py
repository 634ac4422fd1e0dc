"""BM25 retrieval (llm/retrieval.py): exact agreement with a
sequential reference, the pruned-scan plan contract, and index-layout
properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import (
    bm25_reference,
    bm25_score_table,
    bm25_topk,
    write_text_index,
)

QUERY = "the quick brown data pipeline"


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bm25") / "idx")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    write_text_index(docs, path)
    return path


def test_scores_match_sequential_reference(spark, sf_dir, index_path):
    rows = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    ref = bm25_reference(rows, QUERY)
    got = {
        r["doc"]: r["score"]
        for r in bm25_score_table(spark, index_path, QUERY).collect()
    }
    assert set(got) == set(ref)
    for d, s in ref.items():
        assert got[d] == pytest.approx(s, rel=1e-12), d


def test_topk_order_and_tiebreak(spark, sf_dir, index_path):
    rows = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    ref = bm25_reference(rows, QUERY)
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["doc"], r["score"])
        for r in bm25_topk(spark, index_path, QUERY, k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12), gd


def test_plan_prunes_to_query_terms(spark, index_path):
    """The postings scan must carry BOTH a partition filter on the
    query's term buckets AND a pushed value filter on the term hashes
    — only the query's posting lists are read — and the top-k is a
    per-partition heap; document frequencies broadcast."""
    df = bm25_topk(spark, index_path, QUERY, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*tb[^\]]*)\]", plan)
    assert m and m.group(1).strip(), "term-bucket partition pruning"
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "term" in pushed.group(1), "term value pushdown"
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_empty_docs_not_indexed(spark, index_path, tmp_path):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "   "), (3, None), (4, "beta gamma")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx2")
    write_text_index(docs, path)
    import json

    stats = json.loads(
        open(f"{path}/_stats.json", encoding="utf-8").read()
    )
    assert stats["n_docs"] == 2  # blank/NULL docs never indexed
    got = {r["doc"] for r in bm25_score_table(spark, path, "beta").collect()}
    assert got == {1, 4}


def test_empty_query_rejected(spark, index_path):
    with pytest.raises(ValueError):
        bm25_topk(spark, index_path, "   ")
