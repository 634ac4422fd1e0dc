"""Int8 embedding quantization (llm/quant.py): reconstruction error
bound, search recall with and without re-rank, determinism, and the
map-only scoring plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.quant import (
    dequantize_col,
    quantize_embeddings,
    quantized_topk,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.similarity import brute_force_topk


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(400)
    )


@pytest.fixture(scope="module")
def quantized(vectors):
    return quantize_embeddings(vectors)


def test_reconstruction_error_within_half_step(spark, vectors, quantized):
    """|v_i − scale·code_i| ≤ scale/2 + ulps, per element, every row."""
    rows = quantized.select(
        "embedding", "q_scale", dequantize_col("q_scale", "q_code").alias("deq")
    ).collect()
    assert rows
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        d = np.asarray(r["deq"], dtype=np.float64)
        assert v.shape == d.shape
        assert np.all(np.abs(v - d) <= r["q_scale"] / 2 + 1e-12)


def test_zero_vector_quantizes_cleanly(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    q = quantize_embeddings(df)
    rows = {r["vec_id"]: r for r in q.select(
        "vec_id", "q_scale", dequantize_col("q_scale", "q_code").alias("deq")
    ).collect()}
    assert rows[1]["q_scale"] == 0.0
    assert rows[1]["deq"] == [0.0, 0.0, 0.0]
    assert abs(rows[2]["deq"][1] - (-2.0)) < 2.0 / 127


def test_code_is_one_byte_per_dim(spark, vectors, quantized):
    dims = len(vectors.first()["embedding"])
    sizes = quantized.select(F.length("q_code").alias("n")).distinct().collect()
    assert [r["n"] for r in sizes] == [dims]


def test_quantization_deterministic_and_partition_invariant(spark, vectors):
    a = {
        r["vec_id"]: (r["q_scale"], bytes(r["q_code"]))
        for r in quantize_embeddings(vectors).collect()
    }
    b = {
        r["vec_id"]: (r["q_scale"], bytes(r["q_code"]))
        for r in quantize_embeddings(vectors.repartition(7)).collect()
    }
    assert a == b


def test_approx_topk_close_and_rerank_exact(spark, vectors, quantized):
    """Approx-only top-k must substantially overlap the exact answer
    (unit-ish vectors, 1e-2-scale quantization error); the re-ranked
    form must EQUAL exact brute force — ids and scores."""
    qvec = [float(x) for x in vectors.first()["embedding"]]
    exact = brute_force_topk(vectors, qvec, k=10).collect()
    exact_ids = [r["vec_id"] for r in exact]

    approx = quantized_topk(quantized, qvec, k=10).collect()
    overlap = len(set(exact_ids) & {r["vec_id"] for r in approx})
    assert overlap >= 7, (exact_ids, [r["vec_id"] for r in approx])

    rr = quantized_topk(
        quantized, qvec, k=10, rerank_with=vectors, rerank_factor=4
    ).collect()
    assert [r["vec_id"] for r in rr] == exact_ids
    for a, b in zip(rr, exact):
        assert abs(a["score"] - b["sim" if "sim" in b else "score"]) < 1e-12


def test_scoring_plan_map_only_narrow(spark, quantized, tmp_path):
    """Against a PERSISTED quantized table (the production layout —
    that's what the 4× bandwidth saving is) the search plan is
    ArrowEval over the 3-column scan plus a TakeOrderedAndProject
    heap; the raw embedding column is never read."""
    path = str(tmp_path / "qtab")
    quantized.drop("embedding").write.parquet(path)
    qtab = spark.read.parquet(path)
    qvec = [0.1] * len(
        np.frombuffer(bytes(qtab.first()["q_code"]), dtype=np.int8)
    )
    plan = (
        quantized_topk(qtab, qvec, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "ArrowEvalPython" in plan
    assert "embedding" not in plan  # raw vectors never scanned
    assert "Exchange" not in plan  # heap gather only, no data shuffle


def test_validation(spark, quantized):
    with pytest.raises(ValueError, match="k must be"):
        quantized_topk(quantized, [0.1, 0.2], k=0)
    with pytest.raises(ValueError, match="rerank_factor"):
        quantized_topk(quantized, [0.1], k=1, rerank_factor=0)


def test_null_embedding_rejected(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="NULL embedding"):
        quantize_embeddings(df).collect()


def test_query_dim_mismatch_fails_loudly(spark, quantized):
    with pytest.raises(Exception, match="do not all match"):
        quantized_topk(quantized, [0.1, 0.2, 0.3], k=3).collect()


def test_rerank_frame_must_cover_candidates(spark, vectors, quantized):
    qvec = [float(x) for x in vectors.first()["embedding"]]
    partial = vectors.limit(3)
    with pytest.raises(ValueError, match="absent from"):
        quantized_topk(quantized, qvec, k=10, rerank_with=partial)


def test_rerank_coverage_tolerates_duplicate_ids(spark, vectors, quantized):
    """A quantized table with duplicate ids (the documented re-append
    hazard) must not trip a spurious coverage error when every id IS
    covered by rerank_with (r9: the check compared a distinct count
    against a with-duplicates candidate list)."""
    q = [r["embedding"] for r in vectors.limit(1).collect()][0]
    dup = quantized.unionByName(quantized.limit(5))
    got = quantized_topk(
        dup, q, k=5, rerank_with=vectors, rerank_factor=2
    ).collect()
    assert len(got) == 5
    assert len({r["vec_id"] for r in got}) == 5
