"""Product quantization (llm/pq.py): encode/ADC exactness on
codebook-aligned data, recall with re-rank, determinism, and shape
validation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.pq import (
    PQModel,
    encode_pq,
    pq_topk,
    pq_topk_rerank,
    train_pq,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.similarity import brute_force_topk

DIMS, M, KSUB = 16, 4, 4


def _model(seed: int = 3) -> PQModel:
    rng = np.random.default_rng(seed)
    return PQModel(
        codebooks=rng.standard_normal((M, KSUB, DIMS // M)), dims=DIMS
    )


def _df_from(spark, mat: np.ndarray):
    rows = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_model_validation():
    with pytest.raises(ValueError):
        PQModel(codebooks=np.zeros((4, 4, 3)), dims=16)  # 4*3 != 16
    with pytest.raises(ValueError):
        PQModel(codebooks=np.zeros((2, 300, 8)), dims=16)  # ksub > 256


def test_adc_exact_on_codebook_aligned_vectors(spark):
    """Vectors assembled FROM the codebooks reconstruct losslessly, so
    ADC distance equals true squared L2 and PQ top-k equals exact
    top-k (float32 storage keeps the small integer grid exact)."""
    model = PQModel(
        codebooks=np.arange(M * KSUB * (DIMS // M), dtype=np.float64).reshape(
            M, KSUB, DIMS // M
        )
        % 7,
        dims=DIMS,
    )
    rng = np.random.default_rng(0)
    choices = rng.integers(0, KSUB, size=(40, M))
    mat = np.concatenate(
        [model.codebooks[s][choices[:, s]] for s in range(M)], axis=1
    )
    df = _df_from(spark, mat)
    coded = encode_pq(df, model)
    got = {
        r.vec_id: bytes(r.pq_code) for r in coded.collect()
    }
    for i in range(40):
        assert got[i] == choices[i].astype(np.uint8).tobytes()

    q = mat[7]
    top = pq_topk(coded, model, q, k=5).collect()
    true_d = ((mat - q) ** 2).sum(1)
    order = sorted(range(40), key=lambda i: (true_d[i], i))[:5]
    assert [r.vec_id for r in top] == order
    for r in top:
        assert r.adc_dist == pytest.approx(true_d[r.vec_id], abs=1e-9)


def test_train_encode_search_recall_with_rerank(spark):
    """On clustered unit-norm data, ADC-prefilter + exact re-rank
    reproduces the exact cosine top-k bit-identically once the
    candidate set covers it (here: candidates = the whole table via
    the min_candidates floor — the declared-query posture)."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((5, DIMS))
    mat = np.vstack([
        c + 0.05 * rng.standard_normal((30, DIMS)) for c in centers
    ])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    df = _df_from(spark, mat).cache()
    model = train_pq(df, m=M, ksub=8, n_iter=4)
    assert model.codebooks.shape == (M, 8, DIMS // M)

    q = [float(x) for x in mat[3]]
    exact = [(r.vec_id, round(r.sim, 8)) for r in brute_force_topk(df, q, k=10).collect()]
    got = [
        (r.vec_id, round(r.sim, 8))
        for r in pq_topk_rerank(df, model, q, k=10, min_candidates=1000).collect()
    ]
    assert got == exact

    # tight candidate budget: recall@10 against exact top-10 stays high
    approx = {
        r.vec_id
        for r in pq_topk_rerank(
            df, model, q, k=10, refine=3, min_candidates=0
        ).collect()
    }
    assert len(approx & {v for v, _ in exact}) >= 8

    # determinism: training twice yields identical codebooks
    model2 = train_pq(df, m=M, ksub=8, n_iter=4)
    assert np.array_equal(model.codebooks, model2.codebooks)
    df.unpersist()


def test_encode_is_map_only(spark):
    """The encode plan has no Exchange — codes are a pure projection."""
    rng = np.random.default_rng(2)
    df = _df_from(spark, rng.standard_normal((20, DIMS)))
    coded = encode_pq(df, _model())
    plan = coded._sc._jvm.PythonSQLUtils.explainString(
        coded._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan  # Arrow-batched, not row-at-a-time


def test_pq_model_save_load_roundtrip(spark, tmp_path):
    model = _model(seed=9)
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pq import load_pq_model, save_pq_model

    path = str(tmp_path / "pq")
    save_pq_model(spark, model, path)
    back = load_pq_model(spark, path)
    assert back.dims == model.dims
    assert np.array_equal(back.codebooks, model.codebooks)


# --- r5: distributed trainer ------------------------------------------------


def _random_vec_df(spark, n=96, dims=16, seed=7):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dims)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_distributed_trainer_matches_numpy_sample_trainer(spark):
    """When the full table fits the sample budget the two trainers
    see the SAME data in the SAME hash order, mirror each other's
    seeding and tie rules, and must land on the same codebooks (up to
    summation-order ulps in the means)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pq import train_pq, train_pq_distributed

    df = _random_vec_df(spark)
    a = train_pq(df, m=4, ksub=4, n_iter=3)
    b = train_pq_distributed(df, m=4, ksub=4, n_iter=3)
    assert a.codebooks.shape == b.codebooks.shape
    assert np.allclose(a.codebooks, b.codebooks, atol=1e-8), (
        np.abs(a.codebooks - b.codebooks).max()
    )


def test_distributed_iteration_is_one_shuffle(spark):
    """The per-iteration assignment+means aggregate for ALL m
    subspaces must be a single exchange (hash partitioned on
    (subspace, cell)) — m separate kmeans runs would pay m shuffles
    per iteration."""
    from pyspark.sql import functions as F

    from sample_keyspaces_cdc_streams_connectors_spark.llm.pq import _pq_iteration_means

    df = _random_vec_df(spark, n=32)
    dsub = 4
    subvecs = F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda s: F.slice(F.col("embedding"), s * dsub + 1, dsub),
    )
    exploded = df.select(subvecs.alias("__svs")).select(
        F.posexplode("__svs").alias("__s", "__sv")
    )
    books = [[[0.0] * dsub, [0.5] * dsub] for _ in range(4)]
    plan = (
        _pq_iteration_means(exploded, books, dsub)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(__s" in plan
