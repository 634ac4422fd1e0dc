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
- Init is deterministic farthest-point (greedy max-min): the first
  seed is the vector with the lowest ``xxhash64(id)`` (hashed order —
  immune to id-correlated data layouts), each next seed maximizes the
  min distance to the chosen set, ties broken by the hash.  k-1
  map-only scans against a broadcast seed set; no RNG anywhere.
  (Lowest-id init — the previous scheme — can seed all k centroids
  inside ONE cluster when ids correlate with content.)
- Iterations stop early when the relative inertia improvement falls
  below ``tol``; inertia is aggregated inside the same groupBy that
  computes the means, so convergence tracking costs no extra scan.
- Determinism: ties in the argmin break toward the lower cell id.
  Float mean summation order across partitions is NOT guaranteed, so
  centroid bits may vary run-to-run at the ulp level — assignments
  are stable except for points equidistant at that precision
  (documented; tests assert structure, not float bits).
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


def _dists_to_all(vec: Column, centroids: list[list[float]]) -> Column:
    """``array<double>`` of squared L2 distances to every centroid.

    The codebook folds into the plan as ONE k×dims literal matrix
    with ONE shared distance lambda (``transform`` over the matrix) —
    per-element arithmetic identical to :func:`_sq_dist_to`, so the
    values are bit-for-bit the same.  The former spelling (k separate
    fold expressions threaded through a when-chain argmin) duplicated
    every distance O(k) times and made Catalyst analysis cost
    O(k²·dims) per query — measured 32 s of pure planning for
    k=8/dims=64 on 500 rows."""
    mat = F.array(
        *[
            F.array(*[F.lit(float(x)).cast("double") for x in c])
            for c in centroids
        ]
    )
    return F.transform(
        mat,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


def _argmin_of(darr: Column) -> Column:
    """Index of the smallest distance in a :func:`_dists_to_all`
    array (ties -> lowest index; an all-NaN row falls back to cell 0,
    matching the old when-chain whose NaN comparisons were all
    false)."""
    pos = F.array_position(darr, F.array_min(darr))
    return F.when(pos > 0, pos - 1).otherwise(F.lit(0)).cast("int")


def _argmin_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid (ties -> lowest index)."""
    return _argmin_of(_dists_to_all(vec, centroids))


def kmeans_seed(
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable_hash: bool = False,
) -> list[list[float]]:
    """Deterministic farthest-point (greedy max-min) seeding.

    Seed 1 = vector with the lowest ``xxhash64(id)``; seed j+1 =
    vector maximizing ``min(dist to seeds 1..j)``, ties broken by the
    hash.  Each pick is one map-only scan (distances to a broadcast
    seed set folded into the plan) + a top-1 — k-1 scans total, no
    RNG, no dependence on id ordering.

    ``portable_hash=True`` swaps xxhash64 for the md5-derived 60-bit
    hash every oracle-checked operator uses (llm.dedup.md5_int of the
    id's decimal string) — same algorithm, engine-portable, so an
    external SQL engine can replicate the seeding exactly.  Default
    stays xxhash64 (cheaper, JVM-side)."""
    if portable_hash:
        from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import md5_int

        hid = md5_int(F.col(id_col).cast("string"))
    else:
        hid = F.xxhash64(F.col(id_col))
    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = vectors.select(hid.alias("__hid"), dvec.alias("__v"))
    first = base.orderBy("__hid").limit(1).collect()
    if not first:
        raise ValueError("empty vector table")
    seeds = [list(first[0]["__v"])]
    for _ in range(k - 1):
        mind = F.array_min(_dists_to_all(F.col("__v"), seeds))
        nxt = (
            base.select("__hid", "__v", mind.alias("__d"))
            .orderBy(F.desc("__d"), F.asc("__hid"))
            .limit(1)
            .collect()
        )
        seeds.append(list(nxt[0]["__v"]))
    return seeds


def kmeans_fit(
    vectors: DataFrame,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float | None = 1e-4,
    history: list[float] | None = None,
    exact_means: bool = False,
    portable_hash: bool = False,
) -> list[list[float]]:
    """Run Lloyd's iterations from farthest-point seeds; return the
    final codebook (k rows of dims doubles).  Empty cells keep their
    previous centroid.  ``n_iter`` is the max iteration count; the
    loop stops early once the relative inertia improvement drops
    below ``tol`` (inertia is computed inside the same aggregation as
    the means, so the stop costs no extra pass).  ``tol=None``
    disables the early stop (exactly ``n_iter`` iterations run — the
    reproducible-training mode needs a deterministic iteration
    count, since inertia is an order-dependent float sum).  Pass
    ``history=[]`` to observe the per-iteration assignment inertia.

    ``exact_means=True`` makes training bit-reproducible across
    engines AND across partitionings: each centroid component is
    ``double(Σ decimal(28,6)(x)) / count`` — the decimal sum is exact
    and order-independent, and the final double division is one IEEE
    op, so any engine computing the same formula lands on the
    identical centroid bits (the default float ``avg`` is
    shuffle-order-dependent at the ulp level).  The 1e-6 component
    quantization inside the SUM is noise for a coarse quantizer.
    Combined with ``portable_hash=True`` this makes the whole
    training run replicable in plain SQL — the basis of the
    ``ann_ivf_topk`` oracle gate."""
    # kmeans_seed always returns k seeds (the greedy max-min pick
    # repeats points when the table runs short), so the row-count
    # check must happen HERE — otherwise a small table silently
    # yields a codebook with duplicate centroids and permanently
    # empty IVF cells.  limit(k) bounds the validation scan at k
    # rows (a bare count() would read the whole table), and running
    # it BEFORE the dims probe gives the empty table the same clean
    # error instead of a NoneType crash.
    n = vectors.limit(k).count()
    if n < k:
        raise ValueError(f"need >= {k} vectors, got {n}")
    dims = len(
        vectors.select(F.col(vec_col)).first()[0]
    )
    centroids = kmeans_seed(
        vectors, k, id_col=id_col, vec_col=vec_col, portable_hash=portable_hash
    )

    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    prev_inertia: float | None = None
    for _ in range(n_iter):
        darr = _dists_to_all(dvec, centroids)
        assigned = vectors.select(
            darr.alias("__da"), dvec.alias("__v")
        ).select(
            _argmin_of(F.col("__da")).alias("cell"),
            F.array_min("__da").alias("__d"),
            F.col("__v"),
        )
        # mean per cell: dims scalar aggregates — map-side partial
        # (sum, count) per cell keeps the shuffle tiny.  The per-cell
        # inertia contribution rides along in the same shuffle.
        if exact_means:
            aggs = [
                F.sum(
                    F.element_at("__v", i + 1).cast("decimal(28,6)")
                ).alias(f"c{i}")
                for i in range(dims)
            ] + [F.count("*").alias("__cnt")]
        else:
            aggs = [
                F.avg(F.element_at("__v", i + 1)).alias(f"c{i}")
                for i in range(dims)
            ]
        means = assigned.groupBy("cell").agg(
            *aggs,
            F.sum("__d").alias("__inertia"),
        )
        rows = means.collect()
        if exact_means:
            # double(exact decimal sum) / count — one IEEE division,
            # identical in any engine computing the same formula
            new = {
                r["cell"]: [
                    float(r[f"c{i}"]) / r["__cnt"] for i in range(dims)
                ]
                for r in rows
            }
        else:
            new = {
                r["cell"]: [r[f"c{i}"] for i in range(dims)] for r in rows
            }
        centroids = [new.get(j, centroids[j]) for j in range(k)]
        # inertia of the ASSIGNMENT step (pre-update) — monotone
        # non-increasing across iterations by Lloyd's argument
        inertia = float(sum(r["__inertia"] for r in rows))
        if history is not None:
            history.append(inertia)
        if tol is not None and prev_inertia is not None and prev_inertia > 0:
            if (prev_inertia - inertia) / prev_inertia < tol:
                break
        prev_inertia = inertia
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
    return (
        vectors.select(
            F.array_min(_dists_to_all(dvec, centroids)).alias("d")
        )
        .agg(F.sum("d").alias("s"))
        .first()
        .s
    )
