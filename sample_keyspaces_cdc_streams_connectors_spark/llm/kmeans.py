"""Distributed Lloyd's k-means — the IVF coarse quantizer.

``llm.similarity.ivf_topk`` probes inverted-file cells; the fixture
supplies cells via its ``label`` column, and THIS module supplies
them in production: a k-means pass over the embedding column whose
output cell ids feed ``ivf_topk(cell_col=...)`` and the partitioned
table layout (partition by cell → probing is partition pruning).

Reference tie-in: the reference stores vectors remotely and delegates
search entirely (S3VectorTargetMapper.java:87-177); a native engine
needs its own quantizer to make ANN scale past brute force.

Scale design:
- Each iteration is ONE map-only scan (distance argmin against a
  small broadcast codebook — k·dims literals folded into the plan)
  plus ONE groupBy(cell) whose map-side partial state is k rows of
  (sum-vector, count) per partition; the shuffle moves kilobytes.
- The codebook (k × dims floats) collects to the driver per
  iteration — the classic k-means structure; k is small by design
  (the coarse quantizer's job is 1/k scan pruning, not fine ranking).
- Determinism: init picks the k lowest-id vectors (no RNG); ties in
  the argmin break toward the lower cell id.  Float mean summation
  order across partitions is NOT guaranteed, so centroid bits may
  vary run-to-run at the ulp level — assignments are stable except
  for points equidistant at that precision (documented; tests assert
  structure, not float bits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist_to(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid, as a sequential
    left-fold (index-zipped to avoid materializing a pair array)."""
    c = F.array(*[F.lit(float(x)).cast("double") for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _argmin_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid (ties -> lowest index)."""
    dists = [_sq_dist_to(vec, c) for c in centroids]
    best = F.lit(0)
    best_d = dists[0]
    for j in range(1, len(centroids)):
        closer = dists[j] < best_d
        best = F.when(closer, F.lit(j)).otherwise(best)
        best_d = F.when(closer, dists[j]).otherwise(best_d)
    return best.cast("int")


def kmeans_fit(
    vectors: DataFrame,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Run Lloyd's iterations; return the final codebook (k rows of
    dims doubles).  Empty cells keep their previous centroid."""
    dims = len(
        vectors.select(F.col(vec_col)).first()[0]
    )
    init_rows = (
        vectors.orderBy(id_col)
        .limit(k)
        .select(F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"))
        .collect()
    )
    centroids = [list(r.v) for r in init_rows]
    if len(centroids) < k:
        raise ValueError(f"need >= {k} vectors, got {len(centroids)}")

    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    for _ in range(n_iter):
        assigned = vectors.select(
            _argmin_cell(dvec, centroids).alias("cell"), dvec.alias("__v")
        )
        # mean per cell: dims scalar avg aggregates — map-side partial
        # (sum, count) per cell keeps the shuffle tiny
        means = assigned.groupBy("cell").agg(
            *[
                F.avg(F.element_at("__v", i + 1)).alias(f"c{i}")
                for i in range(dims)
            ]
        )
        new = {
            r["cell"]: [r[f"c{i}"] for i in range(dims)]
            for r in means.collect()
        }
        centroids = [new.get(j, centroids[j]) for j in range(k)]
    return centroids


def kmeans_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """(id, cell) assignment against a fixed codebook — the map-only
    labeling pass used both for the IVF index build and for routing
    queries (in production, also the partitioning key of the stored
    table so probes prune partitions)."""
    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return vectors.select(
        F.col(id_col),
        F.col(vec_col),
        _argmin_cell(dvec, centroids).alias(cell_col),
    )


def kmeans_inertia(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> float:
    """Sum of squared distances to the nearest centroid (the Lloyd's
    objective; each iteration must not increase it)."""
    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dists = [_sq_dist_to(dvec, c) for c in centroids]
    return (
        vectors.select(F.least(*dists).alias("d"))
        .agg(F.sum("d").alias("s"))
        .first()
        .s
    )
