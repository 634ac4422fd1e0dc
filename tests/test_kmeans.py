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
    kmeans_seed,
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


def _clustered(spark):
    """8 well-separated clusters whose ids are cluster-ordered (ids
    0-49 cluster 0, 50-99 cluster 1, ...) — the layout where
    lowest-id seeding collapses all seeds into one cluster."""
    import numpy as np

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 16)) * 10.0
    rows = []
    for c in range(8):
        for i in range(50):
            v = centers[c] + rng.standard_normal(16) * 0.2
            rows.append((c * 50 + i, c, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, true_cluster int, embedding array<float>"
    )


def test_farthest_point_seeds_span_clusters(spark):
    """Greedy max-min seeding must place its 8 seeds in 8 DISTINCT
    true clusters of an id-correlated fixture (lowest-id init would
    put all 8 in cluster 0)."""
    import numpy as np

    df = _clustered(spark)
    seeds = kmeans_seed(df, k=8)
    centers = {
        r.true_cluster: np.array(
            [c for c in r.centroid], dtype=float
        )
        for r in df.groupBy("true_cluster")
        .agg(
            F.array(
                *[
                    F.avg(F.element_at("embedding", i + 1))
                    for i in range(16)
                ]
            ).alias("centroid")
        )
        .collect()
    }
    hit = {
        min(centers, key=lambda c: np.linalg.norm(np.array(s) - centers[c]))
        for s in seeds
    }
    assert len(hit) == 8


def test_seeding_deterministic_across_runs(spark):
    df = _clustered(spark).repartition(7)  # layout must not matter
    s1 = kmeans_seed(df, k=8)
    s2 = kmeans_seed(df, k=8)
    assert s1 == s2


def test_converges_early_and_recall_on_clustered(spark):
    """With clean clusters Lloyd's converges in far fewer than the
    iteration budget (history records the actual iterations), and the
    fitted cells drive ivf_topk to near-exact recall@10."""
    df = _clustered(spark)
    hist = []
    cents = kmeans_fit(df, k=8, n_iter=25, tol=1e-4, history=hist)
    assert 1 <= len(hist) < 25  # early stop engaged
    assert all(b <= a * (1 + 1e-9) for a, b in zip(hist, hist[1:]))
    labeled = kmeans_assign(df, cents)
    query = [float(x) for x in df.orderBy("vec_id").first().embedding]
    exact = {r.vec_id for r in brute_force_topk(df, query, k=10).collect()}
    approx = {
        r.vec_id
        for r in ivf_topk(
            labeled, query, k=10, cell_col="cell", n_probe=2
        ).collect()
    }
    assert len(exact & approx) >= 9


def test_ivf_with_kmeans_cells_recall(spark, vectors):
    """End-to-end: kmeans codebook → cell assignment → ivf_topk.

    The embeddings fixture is near-ISOTROPIC (measured: clustering
    purity vs the generator's `label` is 0.18 ≈ random, and probing
    4/10 cells with the TRUE labels also recalls only 6/10), so the
    honest bar here is >= 6 — above the ~5 expected from probing half
    of structureless data.  The quantizer-QUALITY pin lives in
    test_converges_early_and_recall_on_clustered, whose fixture has
    real clusters (>= 9/10 while scanning only a quarter of it).
    (The previous >= 8 pin was an artifact: lowest-id seeding made the
    test query itself a centroid.)"""
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
    assert len(exact & approx) >= 6
    # probing every cell must recover the exact answer
    all_cells = {
        r.vec_id
        for r in ivf_topk(
            labeled, query, k=10, cell_col="cell", n_probe=8
        ).collect()
    }
    assert all_cells == exact


def test_fit_rejects_fewer_vectors_than_k(spark):
    import pytest as _pytest

    from sample_keyspaces_cdc_streams_connectors_spark.llm.kmeans import kmeans_fit

    small = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [10.0, 10.0]), (3, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="need >= 6"):
        kmeans_fit(small, k=6)


def test_fit_rejects_empty_table_cleanly(spark):
    import pytest as _pytest

    from sample_keyspaces_cdc_streams_connectors_spark.llm.kmeans import kmeans_fit

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="got 0"):
        kmeans_fit(empty, k=4)
