"""Hashed-feature logistic quality classifier: separability on a
synthetic labeled set, determinism, scoring plan shape, and the
Spark-written model layout round-trip."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.quality_model import (
    QualityModel,
    load_quality_model,
    save_quality_model,
    score_quality,
    train_quality_model,
)

GOOD = [
    "the quick brown fox jumps over the lazy dog by the river",
    "it was a bright cold day in april and the clocks struck",
    "many years later the colonel remembered that distant afternoon",
    "a clean well lighted place with honest prose and clear thought",
    "reading maketh a full man and writing an exact man indeed",
    "the library held ten thousand volumes of careful scholarship",
]
BAD = [
    "click here buy now free offer click here buy now",
    "zzz win win win prize prize casino casino jackpot zzz",
    "cheap cheap deals deals now now now subscribe subscribe",
    "xxx hot singles click subscribe free free free win",
    "lottery winner claim claim claim now casino bonus bonus",
    "buy cheap pills online now free shipping click click",
]


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(BAD)
    ]
    return spark.createDataFrame(
        rows, "doc_id int, text string, label int"
    ).cache()


@pytest.fixture(scope="module")
def model(labeled):
    return train_quality_model(
        labeled, n_buckets=4096, n_iters=40, lr=1.0, tol=1e-6
    )


def test_training_separates_classes(labeled, model):
    scored = score_quality(labeled, model)
    rows = scored.select("label", "model_quality").collect()
    good = [r["model_quality"] for r in rows if r["label"] == 1]
    bad = [r["model_quality"] for r in rows if r["label"] == 0]
    assert min(good) > 0.5 > max(bad)


def test_training_is_deterministic(labeled, model):
    again = train_quality_model(
        labeled, n_buckets=4096, n_iters=40, lr=1.0, tol=1e-6
    )
    assert again.bias == model.bias
    assert np.array_equal(again.weights, model.weights)


def test_generalizes_to_unseen_variants(spark, model):
    probe = spark.createDataFrame(
        [
            (1, "the fox by the river read a full man of thought"),
            (2, "win free casino prize click subscribe now cheap"),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["model_quality"]
        for r in score_quality(probe, model).collect()
    }
    assert got[1] > got[2]


def test_scoring_plan_is_map_only(spark, sf_dir, model):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        score_quality(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    # the one Python stage is the Arrow-batched margin kernel
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_empty_text_scores_at_bias(spark, model):
    df = spark.createDataFrame([(1, "")], "doc_id int, text string")
    score = score_quality(df, model).collect()[0]["model_quality"]
    expected = 1.0 / (1.0 + np.exp(-model.bias))
    assert score == pytest.approx(expected)


def test_save_load_roundtrip(spark, tmp_path, model):
    path = str(tmp_path / "qm")
    save_quality_model(spark, model, path)
    back = load_quality_model(spark, path)
    assert back.n_buckets == model.n_buckets
    assert back.bias == pytest.approx(model.bias)
    assert np.allclose(back.weights, model.weights)


def test_empty_training_set_rejected(spark):
    empty = spark.createDataFrame([], "doc_id int, text string, label int")
    with pytest.raises(ValueError):
        train_quality_model(empty, n_buckets=64, n_iters=1)


def test_model_shape_validated():
    with pytest.raises(ValueError):
        QualityModel(weights=np.zeros(3), bias=0.0, n_buckets=4)


def test_vectorized_margin_matches_per_row_reference(spark):
    """The flattened reduceat kernel must equal the naive per-row
    gather+sum on every edge shape: None arrays, empty arrays,
    singleton batches, repeated bucket ids."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from sample_keyspaces_cdc_streams_connectors_spark.llm.quality_model import _margin_udf

    rng = np.random.default_rng(7)
    weights = rng.standard_normal(64)
    bias = 0.25
    rows = [
        ([0, 1, 2],),
        (None,),
        ([],),
        ([63],),
        ([5, 5, 5, 5],),
        (list(rng.integers(0, 64, size=37)),),
    ]
    schema = StructType(
        [StructField("f", ArrayType(IntegerType()), True)]
    )
    df = spark.createDataFrame(
        [(list(map(int, r[0])) if r[0] is not None else None,) for r in rows],
        schema,
    )
    got = [
        r["m"]
        for r in df.select(
            _margin_udf(weights, bias)(F.col("f")).alias("m")
        ).collect()
    ]
    want = [
        bias + (sum(weights[i] for i in r[0]) if r[0] else 0.0)
        for r in rows
    ]
    assert np.allclose(got, want)
