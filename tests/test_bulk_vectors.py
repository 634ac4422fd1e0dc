"""Bulk dense retrieval (r9): brute_force_topk_many /
ivf_index_topk_many — one pass for a query TABLE, pinned equivalent
to the per-query paths, plus the bulk lexical⊕dense hybrid."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (
    ivf_index_topk,
    ivf_index_topk_many,
    write_ivf_index,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.similarity import (
    brute_force_topk,
    brute_force_topk_many,
)


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(400)
        .persist()
    )


@pytest.fixture(scope="module")
def queries(spark, vectors):
    return (
        vectors.filter(F.col("vec_id") % 37 == 1)
        .limit(8)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding"),
        )
        .persist()
    )


def test_bulk_brute_matches_per_query_loop(spark, vectors, queries):
    """Rank-for-rank id agreement with the sequential brute_force_topk
    loop; sims agree to 1e-9 (numpy matmul vs JVM fold association)."""
    bulk = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["sim"])
        for r in brute_force_topk_many(vectors, queries, k=7).collect()
    }
    for q in queries.collect():
        want = brute_force_topk(
            vectors, [float(x) for x in q["embedding"]], k=7
        ).collect()
        for rank, w in enumerate(want, start=1):
            got_id, got_sim = bulk[(q["query_id"], rank)]
            assert got_id == w["vec_id"]
            assert abs(got_sim - w["sim"]) < 1e-9
    assert len(bulk) == queries.count() * 7


def test_bulk_brute_single_scan_plan(spark, vectors, queries):
    """ONE pass over the vector table: exactly one ArrowEval /
    mapInPandas node, no join of the vector side, window only over
    the bounded candidates."""
    plan = (
        brute_force_topk_many(vectors, queries, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "Join" not in plan


def test_bulk_list_queries_match_dataframe_form(spark, vectors, queries):
    """r14: a driver-resident (query_id, vector) work list must
    reproduce the DataFrame query-table path EXACTLY — same ids, same
    ranks, bit-equal sims — in both kernel modes (the list skips the
    construction-time collect job, nothing else)."""
    qlist = [
        (r["query_id"], [float(x) for x in r["embedding"]])
        for r in queries.collect()
    ]
    for exact in (False, True):
        df_form = sorted(
            tuple(r)
            for r in brute_force_topk_many(
                vectors, queries, k=5, exact_cos=exact
            ).collect()
        )
        list_form = sorted(
            tuple(r)
            for r in brute_force_topk_many(
                vectors, qlist, k=5, exact_cos=exact
            ).collect()
        )
        assert list_form == df_form, f"exact_cos={exact}"


def test_bulk_list_queries_validate(spark, vectors):
    one = [(1, [1.0, 0.0])]
    with pytest.raises(ValueError, match="unique"):
        brute_force_topk_many(vectors, one + one, k=3)
    with pytest.raises(ValueError, match="empty"):
        brute_force_topk_many(vectors, [], k=3)
    with pytest.raises(ValueError, match="max_queries"):
        brute_force_topk_many(vectors, one * 3, k=3, max_queries=2)


def test_bulk_brute_validates(spark, vectors, queries):
    dup = queries.unionByName(queries.limit(1))
    with pytest.raises(ValueError, match="unique"):
        brute_force_topk_many(vectors, dup, k=3)
    with pytest.raises(ValueError, match="empty"):
        brute_force_topk_many(vectors, queries.filter(F.lit(False)), k=3)
    with pytest.raises(ValueError, match="k must"):
        brute_force_topk_many(vectors, queries, k=0)


@pytest.fixture(scope="module")
def ivf_path(spark, vectors, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bulkivf") / "idx")
    write_ivf_index(vectors, path, k=6)
    return path


def test_bulk_ivf_matches_per_query(spark, vectors, queries, ivf_path):
    """Bulk IVF answers equal per-query ivf_index_topk at the same
    n_probe, for every query and rank."""
    bulk = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["sim"])
        for r in ivf_index_topk_many(
            spark, ivf_path, queries, topk=6, n_probe=2
        ).collect()
    }
    for q in queries.collect():
        want = ivf_index_topk(
            spark,
            ivf_path,
            [float(x) for x in q["embedding"]],
            topk=6,
            n_probe=2,
        ).collect()
        for rank, w in enumerate(want, start=1):
            got_id, got_sim = bulk[(q["query_id"], rank)]
            assert got_id == w["vec_id"]
            assert abs(got_sim - w["sim"]) < 1e-9


def test_bulk_ivf_prunes_to_union_of_probed_cells(
    spark, queries, ivf_path
):
    """The single scan carries a PartitionFilters cell predicate —
    the union of every query's probe set, not the whole index."""
    df = ivf_index_topk_many(spark, ivf_path, queries, topk=5, n_probe=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    assert plan.count("MapInPandas") == 1


def test_bulk_hybrid_fusion(spark, sf_dir, vectors, queries, tmp_path):
    """The production BULK hybrid: bm25_topk_many ⊕
    brute_force_topk_many through rrf_fuse(query_col=...) — per-query
    fused rankings with exact decimal reciprocal sums."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import (
        bm25_topk_many,
        rrf_fuse,
        write_text_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "tidx")
    write_text_index(docs, idx)
    qtab = spark.createDataFrame(
        [(1, "data stream window batch"), (2, "sort merge hash key")],
        "query_id long, query string",
    )
    lex = bm25_topk_many(spark, idx, qtab, k=8).select(
        "query_id", "doc", "score"
    )
    dense_q = vectors.limit(2).select(
        F.when(F.col("vec_id") == vectors.first()["vec_id"], 1)
        .otherwise(2)
        .cast("long")
        .alias("query_id"),
        "embedding",
    )
    den = brute_force_topk_many(
        vectors, dense_q, k=8
    ).select(
        "query_id",
        F.col("vec_id").cast("long").alias("doc"),
        F.col("sim").alias("score"),
    )
    fused = rrf_fuse(
        [lex, den], query_col="query_id", topk=8
    ).collect()
    by_q: dict = {}
    for r in fused:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {1, 2}
    for rows in by_q.values():
        assert 1 <= len(rows) <= 8
        assert all(r["n_rankings"] in (1, 2) for r in rows)
        scores = [r["rrf_score"] for r in rows]
        assert all(s > 0 for s in scores)


def test_exact_cos_mode_bit_identical_to_jvm(spark, vectors, queries):
    """exact_cos=True: dimension-sequential folds — sims EQUAL (==,
    not approx) the single-query JVM path's, the cross-engine gate
    contract behind vector_topk's bulk arms."""
    bulk = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["sim"])
        for r in brute_force_topk_many(
            vectors, queries, k=6, exact_cos=True
        ).collect()
    }
    for q in queries.collect():
        want = brute_force_topk(
            vectors, [float(x) for x in q["embedding"]], k=6
        ).collect()
        for rank, w in enumerate(want, start=1):
            assert bulk[(q["query_id"], rank)] == (w["vec_id"], w["sim"])


def test_bulk_int8_matches_per_query(spark, vectors, queries, tmp_path):
    """Bulk int8 (quantized candidates + exact re-rank) equals
    per-query ivf_int8_topk at the same knobs — ids rank-for-rank,
    sims bit-equal (both re-rank through the sequential cosine)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (
        ivf_int8_topk,
        ivf_int8_topk_many,
        write_ivf_int8_index,
    )

    path = str(tmp_path / "i8idx")
    write_ivf_int8_index(vectors, path, k=5)
    bulk = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["sim"])
        for r in ivf_int8_topk_many(
            spark, path, queries, topk=6, n_probe=2, rerank_factor=4
        ).collect()
    }
    for q in queries.collect():
        want = ivf_int8_topk(
            spark,
            path,
            [float(x) for x in q["embedding"]],
            topk=6,
            n_probe=2,
            rerank_factor=4,
        ).collect()
        for rank, w in enumerate(want, start=1):
            got_id, got_sim = bulk[(q["query_id"], rank)]
            assert got_id == w["vec_id"], (q["query_id"], rank)
            assert abs(got_sim - w["score"]) < 1e-12


def test_bulk_max_queries_guard_fails_fast(spark, vectors, queries, ivf_path, tmp_path):
    """r10: the "queries are a work list, not a corpus" contract is
    executable — every bulk kernel fails fast (ValueError, one
    limit(max+1) probe, never a full collect) when the query table
    exceeds max_queries, on all four bulk entry points."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (
        ivf_int8_topk_many,
        write_ivf_int8_index,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import bm25_topk_many, write_text_index

    with pytest.raises(ValueError, match="max_queries"):
        brute_force_topk_many(vectors, queries, k=3, max_queries=3)
    with pytest.raises(ValueError, match="max_queries"):
        ivf_index_topk_many(
            spark, ivf_path, queries, topk=3, max_queries=3
        )
    i8 = str(tmp_path / "i8g")
    write_ivf_int8_index(vectors.limit(60), i8, k=3)
    with pytest.raises(ValueError, match="max_queries"):
        ivf_int8_topk_many(spark, i8, queries, topk=3, max_queries=3)

    docs = spark.createDataFrame(
        [(i, f"doc about topic {i} data") for i in range(30)],
        "doc_id long, text string",
    )
    tidx = str(tmp_path / "tguard")
    write_text_index(docs, tidx, n_buckets=4)
    qtab = spark.createDataFrame(
        [(i, "data topic") for i in range(5)], "query_id long, query string"
    )
    with pytest.raises(ValueError, match="max_queries"):
        bm25_topk_many(spark, tidx, qtab, k=3, max_queries=3)

    # at the bound (not past it) everything still runs
    assert (
        brute_force_topk_many(
            vectors, queries.limit(3), k=3, max_queries=3, check_unique_ids=False
        ).count()
        == 9
    )
    assert bm25_topk_many(spark, tidx, qtab.limit(3), k=3, max_queries=3).count() > 0
    with pytest.raises(ValueError, match="max_queries must be"):
        brute_force_topk_many(vectors, queries, k=3, max_queries=0)
