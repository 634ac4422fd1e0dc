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


def test_sql_text_scoring_bit_identical_to_column_form(spark, index_path):
    """r14 composes the BM25 scoring pipeline as SQL text (one JVM
    parse per fragment) instead of py4j Column construction, claiming
    bit-identical arithmetic: every float literal parses to the SAME
    double the old ``F.lit`` carried.  Pin it — the pre-r14 Column
    pipeline, reconstructed verbatim below, must produce EXACTLY equal
    scores (==, not approx) through the order-independent decimal
    sum."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import (
        POSTINGS_DIR,
        TERMS_DIR,
        _hash60,
        _load_stats,
        _py_words,
    )

    k1, b = 1.2, 0.75
    q_terms = sorted({_hash60(w) for w in _py_words(QUERY)})
    stats = _load_stats(spark, index_path)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    n_buckets = int(stats.get("n_buckets", 64))
    buckets = sorted({t % n_buckets for t in q_terms})
    base = index_path.rstrip("/")
    postings = (
        spark.read.parquet(f"{base}/{POSTINGS_DIR}")
        .filter(F.col("tb").isin(buckets))
        .filter(F.col("term").isin(q_terms))
    )
    dfreq = (
        spark.read.parquet(f"{base}/{TERMS_DIR}")
        .filter(F.col("term").isin(q_terms))
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .withColumn(
            "idf",
            F.log(
                (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
    )
    tf = F.col("tf").cast("double")
    per_term = postings.join(F.broadcast(dfreq), "term").select(
        "doc",
        (
            F.col("idf")
            * tf
            * (F.lit(k1) + 1.0)
            / (
                tf
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl").cast("double") / F.lit(float(avgdl))
                )
            )
        ).alias("__s"),
    )
    col_form = {
        r["doc"]: r["score"]
        for r in per_term.groupBy("doc")
        .agg(
            F.sum(F.col("__s").cast("decimal(28,12)"))
            .cast("double")
            .alias("score")
        )
        .collect()
    }
    got = {
        r["doc"]: r["score"]
        for r in bm25_score_table(
            spark, index_path, QUERY, exact_sum=True
        ).collect()
    }
    assert got == col_form


# --- bulk query scoring (bm25_topk_many) ------------------------------------


def test_bulk_matches_per_query_loop(spark, sf_dir, index_path):
    """bm25_topk_many must reproduce the per-query path exactly —
    same docs, same order, same scores to 1e-12 — for a mixed batch
    (multi-term, single-term, partially-unindexed, fully-unindexed)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import bm25_topk_many

    qs = [
        (0, QUERY),
        (1, "data pipeline"),
        (2, "quick zzzznotindexedzzzz brown"),
        (3, "zzzznotindexedzzzz qqqqalsonotqqqq"),
        (4, "the"),
    ]
    queries = spark.createDataFrame(qs, "query_id long, query string")
    bulk = {}
    for r in bm25_topk_many(spark, index_path, queries, k=7).collect():
        bulk.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc"], r["score"])
        )
    for qid, qtext in qs:
        want = [
            (i + 1, r["doc"], r["score"])
            for i, r in enumerate(
                bm25_topk(spark, index_path, qtext, k=7).collect()
            )
        ]
        got = sorted(bulk.get(qid, []))
        assert [g[:2] for g in got] == [w[:2] for w in want], qid
        for g, w in zip(got, want):
            assert g[2] == pytest.approx(w[2], rel=1e-12), (qid, g[1])
    assert 3 not in bulk  # fully-unindexed query scores nothing


def test_bulk_plan_one_pruned_postings_pass(spark, index_path):
    """The bulk plan's contract: exactly ONE scan of the postings
    parquet, carrying a static partition filter on the query load's
    term buckets; the query side broadcasts; per-query top-k is a
    window rank, not a cartesian or a per-query job."""
    import re

    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import bm25_topk_many

    queries = spark.createDataFrame(
        [(0, QUERY), (1, "data pipeline quality")],
        "query_id long, query string",
    )
    df = bm25_topk_many(spark, index_path, queries, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("postings") >= 1
    # one postings scan only (the scan string names the directory)
    n_scans = len(
        re.findall(r"Scan parquet[^\n]*postings", plan)
    )
    assert n_scans == 1, plan[:2000]
    m = re.search(r"PartitionFilters: \[([^\]]*tb[^\]]*)\]", plan)
    assert m and m.group(1).strip(), "bucket partition pruning survives bulk"
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bulk_empty_and_unindexed_queries(spark, index_path):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import bm25_topk_many

    queries = spark.createDataFrame(
        [(0, "zzzznotindexedzzzz")], "query_id long, query string"
    )
    out = bm25_topk_many(spark, index_path, queries, k=5)
    assert out.count() == 0
    assert out.columns == ["query_id", "doc", "score", "rank"]


def test_bulk_shuffle_join_mode_equivalent(spark, index_path):
    """broadcast_queries=False (the huge-query-table mode) must score
    identically — same plan semantics, shuffle join instead."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import bm25_topk_many

    queries = spark.createDataFrame(
        [(0, QUERY), (1, "data pipeline")], "query_id long, query string"
    )
    a = sorted(
        (r["query_id"], r["rank"], r["doc"], round(r["score"], 9))
        for r in bm25_topk_many(spark, index_path, queries, k=6).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["doc"], round(r["score"], 9))
        for r in bm25_topk_many(
            spark, index_path, queries, k=6, broadcast_queries=False
        ).collect()
    )
    assert a == b and a


def test_bulk_duplicate_query_ids_rejected(spark, index_path):
    """A duplicated query_id with different texts would merge two term
    sets into scores matching no actual query — checked up front."""
    import pytest as _pytest

    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import bm25_topk_many

    queries = spark.createDataFrame(
        [(0, QUERY), (0, "data pipeline")], "query_id long, query string"
    )
    with _pytest.raises(ValueError, match="unique"):
        bm25_topk_many(spark, index_path, queries, k=5)


def test_exact_sum_mode_matches_plain_and_is_order_free(spark, index_path):
    """exact_sum=True (the bm25_rank oracle-gate mode) must agree with
    the plain double sum to 1e-9 and return the same ranking."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import bm25_topk

    plain = bm25_topk(spark, index_path, QUERY, k=8).collect()
    exact = bm25_topk(spark, index_path, QUERY, k=8, exact_sum=True).collect()
    assert [r["doc"] for r in plain] == [r["doc"] for r in exact]
    for a, b in zip(plain, exact):
        assert abs(a["score"] - b["score"]) < 1e-9


# --- reciprocal-rank fusion (r8) --------------------------------------------


def _py_rrf(rankings, k_rrf=60):
    """Sequential RRF reference: rank by (score desc, id asc), each
    reciprocal rounded to 12 decimals like the engine's DECIMAL
    detour."""
    from decimal import Decimal, ROUND_HALF_UP

    acc: dict = {}
    cnt: dict = {}
    for ranking in rankings:
        ordered = sorted(ranking, key=lambda t: (-t[1], t[0]))
        for rank, (doc, _s) in enumerate(ordered, start=1):
            term = Decimal(1.0 / (k_rrf + rank)).quantize(
                Decimal("1e-12"), rounding=ROUND_HALF_UP
            )
            acc[doc] = acc.get(doc, Decimal(0)) + term
            cnt[doc] = cnt.get(doc, 0) + 1
    return {d: (float(v), cnt[d]) for d, v in acc.items()}


def test_rrf_matches_sequential_reference(spark, sf_dir, index_path):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import rrf_fuse

    ra = bm25_topk(spark, index_path, QUERY, k=12)
    # second query SHARES terms with the first so the fused set
    # actually exercises the seen-in-both path
    rb = bm25_topk(spark, index_path, f"sort merge {QUERY}", k=12)
    got = {
        r["doc"]: (r["rrf_score"], r["n_rankings"])
        for r in rrf_fuse([ra, rb]).collect()
    }
    ref = _py_rrf(
        [
            [(r["doc"], r["score"]) for r in ra.collect()],
            [(r["doc"], r["score"]) for r in rb.collect()],
        ]
    )
    assert got.keys() == ref.keys()
    for d in ref:
        assert abs(got[d][0] - ref[d][0]) < 1e-12, d
        assert got[d][1] == ref[d][1], d
    # docs in both rankings outrank equal-rank singletons
    assert any(n == 2 for _s, n in got.values())


def test_rrf_hybrid_lexical_vector(spark, sf_dir, index_path):
    """The production hybrid: BM25 ranking fused with a dense
    embedding-cosine top-k over the same documents — a doc ranked in
    BOTH modalities must beat a doc seen only once at the same
    ranks."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.embedding import hash_embed
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import rrf_fuse
    from sample_keyspaces_cdc_streams_connectors_spark.llm.similarity import brute_force_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lex = bm25_topk(spark, index_path, QUERY, k=10)
    embedded = docs.select(
        F.col("doc_id").alias("doc"), hash_embed(F.col("text"), 64).alias("emb")
    )
    probe_text = docs.orderBy("doc_id").first()["text"]
    import numpy as np

    from sample_keyspaces_cdc_streams_connectors_spark.llm.embedding import _hash_vec

    qvec = [float(x) for x in _hash_vec(probe_text, 64)]
    dense = brute_force_topk(
        embedded, qvec, k=10, id_col="doc", vec_col="emb"
    ).select("doc", F.col("sim").alias("score"))
    fused = rrf_fuse([lex, dense], topk=10)
    rows = fused.collect()
    assert 0 < len(rows) <= 10
    # the probe doc is its own dense rank-1; it must appear in the fusion
    assert any(r["doc"] == 0 for r in rows) or any(
        r["n_rankings"] == 2 for r in rows
    )


def test_rrf_per_query_bulk(spark, index_path):
    """query_col mode fuses per query id (bulk rankings in, bulk
    fusion out)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import bm25_topk_many, rrf_fuse

    queries = spark.createDataFrame(
        [(1, QUERY), (2, "sort merge hash key")],
        "query_id long, query string",
    )
    bulk = bm25_topk_many(spark, index_path, queries, k=8)
    fused = rrf_fuse(
        [bulk, bulk], query_col="query_id", topk=5
    ).collect()
    per_q: dict = {}
    for r in fused:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {1, 2}
    for q, rows in per_q.items():
        assert len(rows) <= 5
        # identical rankings fused with themselves: every doc seen twice
        assert all(r["n_rankings"] == 2 for r in rows)


def test_rrf_validates(spark):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import rrf_fuse

    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])
    df = spark.createDataFrame([(1, 0.5)], "doc long, score double")
    with pytest.raises(ValueError, match="k_rrf"):
        rrf_fuse([df], k_rrf=0)


# --- incremental text-index append (r8) --------------------------------------


def test_append_matches_from_scratch(spark, sf_dir, tmp_path):
    """Index A, append B: single-query and bulk scores equal a
    from-scratch index over A∪B (same docs, same ranking; scores to
    1e-9 — the streaming-mean avgdl differs from the batch AVG by
    float association only)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import (
        append_to_text_index,
        bm25_topk,
        bm25_topk_many,
        write_text_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.filter(F.col("doc_id") % 3 != 0)
    b = docs.filter(F.col("doc_id") % 3 == 0)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    write_text_index(a, inc)
    append_to_text_index(b, inc)
    write_text_index(docs, full)

    q = QUERY
    got = bm25_topk(spark, inc, q, k=15, exact_sum=True).collect()
    want = bm25_topk(spark, full, q, k=15, exact_sum=True).collect()
    assert [r["doc"] for r in got] == [r["doc"] for r in want]
    for g, w in zip(got, want):
        assert abs(g["score"] - w["score"]) < 1e-9

    queries = spark.createDataFrame(
        [(1, q), (2, "sort merge hash key")], "query_id long, query string"
    )
    bulk_inc = {
        (r["query_id"], r["rank"]): (r["doc"], r["score"])
        for r in bm25_topk_many(spark, inc, queries, k=8).collect()
    }
    bulk_full = {
        (r["query_id"], r["rank"]): (r["doc"], r["score"])
        for r in bm25_topk_many(spark, full, queries, k=8).collect()
    }
    assert bulk_inc.keys() == bulk_full.keys()
    for key in bulk_full:
        assert bulk_inc[key][0] == bulk_full[key][0]
        assert abs(bulk_inc[key][1] - bulk_full[key][1]) < 1e-9


def test_append_is_append_only_and_restatted(spark, sf_dir, tmp_path):
    import os

    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import (
        _load_stats,
        append_to_text_index,
        write_text_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.filter(F.col("doc_id") < 100)
    b = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 120))
    path = str(tmp_path / "appendonly")
    write_text_index(a, path)
    before = set()
    for root, _d, files in os.walk(f"{path}/postings"):
        before |= {os.path.join(root, f) for f in files if f.endswith(".parquet")}
    s0 = _load_stats(spark, path)
    append_to_text_index(b, path)
    after = set()
    for root, _d, files in os.walk(f"{path}/postings"):
        after |= {os.path.join(root, f) for f in files if f.endswith(".parquet")}
    assert before <= after  # no original posting file replaced
    s1 = _load_stats(spark, path)
    assert s1["n_docs"] == s0["n_docs"] + b.count()
    assert s1["n_buckets"] == s0["n_buckets"]
    # empty append is a no-op
    append_to_text_index(docs.filter(F.lit(False)), path)
    assert _load_stats(spark, path) == s1


def test_probe_uses_persisted_bucket_count(spark, sf_dir, tmp_path):
    """An index written with a non-default n_buckets must prune
    correctly from probes that never pass it (the stats file is the
    layout authority, r8)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import bm25_topk, write_text_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p16 = str(tmp_path / "nb16")
    write_text_index(docs, p16, n_buckets=16)
    # default-arg probe (n_buckets=64) must still return the right answer
    got = [r["doc"] for r in bm25_topk(spark, p16, QUERY, k=10).collect()]
    p64 = str(tmp_path / "nb64")
    write_text_index(docs, p64)
    want = [r["doc"] for r in bm25_topk(spark, p64, QUERY, k=10).collect()]
    assert got == want


def test_append_requires_bucket_count_in_stats(spark, sf_dir, tmp_path):
    """A pre-r8 stats file (no n_buckets) must hard-fail the append:
    guessing a bucket count would write postings into tb partitions
    probes never scan, silently dropping the appended docs (r9)."""
    import json

    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import _read_text, _write_text
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import (
        STATS_FILE,
        append_to_text_index,
        write_text_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "legacy")
    write_text_index(docs.filter(F.col("doc_id") < 50), path)
    stats = json.loads(_read_text(spark, f"{path}/{STATS_FILE}"))
    del stats["n_buckets"]
    _write_text(spark, f"{path}/{STATS_FILE}", json.dumps(stats))
    with pytest.raises(ValueError, match="n_buckets"):
        append_to_text_index(docs.filter(F.col("doc_id") >= 50), path)


def test_rrf_bounded_input_contract_enforced(spark):
    """max_input_rows is an executable contract: fusing a ranking
    longer than the bound fails the job instead of silently windowing
    a corpus-sized frame (r9)."""
    from py4j.protocol import Py4JJavaError

    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import rrf_fuse

    big = spark.range(100).select(
        F.col("id").alias("doc"), (F.col("id") * 1.0).alias("score")
    )
    ok = rrf_fuse([big], max_input_rows=100).collect()
    assert len(ok) == 100
    with pytest.raises(Exception) as exc:
        rrf_fuse([big], max_input_rows=50).collect()
    assert "max_input_rows" in str(exc.value)


def test_rrf_no_unpartitioned_window(spark):
    """Single-query fusion must rank over a real (__src) partition
    key — no single-partition no-key WindowExec (r9: F.lit(0) was
    constant-folded away, leaving the warned-about empty spec)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import rrf_fuse

    a = spark.range(10).select(
        F.col("id").alias("doc"), (F.col("id") * 1.0).alias("score")
    )
    b = spark.range(10).select(
        F.col("id").alias("doc"), (10.0 - F.col("id")).alias("score")
    )
    plan = rrf_fuse([a, b], topk=5)._jdf.queryExecution().executedPlan().toString()
    # every Window node must carry a partition spec mentioning __src
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__src" in line or "rrf_score" in line, line
