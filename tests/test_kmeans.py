"""k-means coarse quantizer: Lloyd's objective decreases, assignments
are total, and the codebook drives ivf_topk end-to-end with high
recall against brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.kmeans import (
    kmeans_assign,
    kmeans_fit,
    kmeans_inertia,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.similarity import brute_force_topk, ivf_topk


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_inertia_monotone_nonincreasing(spark, vectors):
    prev = None
    import sample_keyspaces_cdc_streams_connectors_spark.llm.kmeans as km

    # run iterations one at a time so the objective is observable
    cents = km.kmeans_fit(vectors, k=8, n_iter=0)
    for _ in range(4):
        inertia = kmeans_inertia(vectors, cents)
        if prev is not None:
            assert inertia <= prev * (1 + 1e-9)
        prev = inertia
        # one more Lloyd step: assign + means, via kmeans_fit n_iter=1
        # starting from the current codebook — re-derive by hand
        assigned = kmeans_assign(vectors, cents)
        dims = len(cents[0])
        means = (
            assigned.groupBy("cell")
            .agg(
                *[
                    F.avg(
                        F.element_at(
                            F.transform(
                                F.col("embedding"), lambda x: x.cast("double")
                            ),
                            i + 1,
                        )
                    ).alias(f"c{i}")
                    for i in range(dims)
                ]
            )
        )
        new = {
            r["cell"]: [r[f"c{i}"] for i in range(dims)] for r in means.collect()
        }
        cents = [new.get(j, cents[j]) for j in range(len(cents))]


def test_assignment_total_and_bounded(spark, vectors):
    cents = kmeans_fit(vectors, k=8, n_iter=3)
    a = kmeans_assign(vectors, cents)
    n = vectors.count()
    assert a.count() == n
    mm = a.agg(
        F.min("cell").alias("lo"), F.max("cell").alias("hi")
    ).first()
    assert mm.lo >= 0 and mm.hi < 8


def test_ivf_with_kmeans_cells_recall(spark, vectors):
    """End-to-end: kmeans codebook → cell assignment → ivf_topk probes
    half the cells → recall@10 vs exact brute force >= 0.8 on the
    fixture (clustered synthetic data; probing below that would mean
    the quantizer is broken, not merely approximate)."""
    query = [float(x) for x in vectors.orderBy("vec_id").first().embedding]
    cents = kmeans_fit(vectors, k=8, n_iter=3)
    labeled = kmeans_assign(vectors, cents)
    exact = {
        r.vec_id for r in brute_force_topk(vectors, query, k=10).collect()
    }
    approx = {
        r.vec_id
        for r in ivf_topk(
            labeled, query, k=10, cell_col="cell", n_probe=4
        ).collect()
    }
    assert len(approx) == 10
    assert len(exact & approx) >= 8
