"""Similarity search over embedding columns.

The reference delegates vector similarity to the S3 Vectors service
(S3VectorTargetMapper.java:87-177); here it is native:

- :func:`brute_force_topk` — exact cosine top-k.  The query vector is
  a *literal* broadcast into the plan (no join, no shuffle): one scan,
  per-partition heap via TakeOrderedAndProject.  This is the right
  plan even at 100 TB when k is small — it reads every vector once
  and moves only k rows per partition.
- :func:`lsh_bucket_topk` — sign-random-projection LSH: vectors are
  bucketed by the sign pattern of J fixed deterministic hyperplanes
  (md5-derived pseudo-random, engine-portable); the search touches
  only the query's bucket.  At scale, write the table bucketed/
  partitioned by ``bucket`` and the scan prunes to ~1/2^J of the
  data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.functions.vectors import cosine_similarity


def _query_lit(query_vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)).cast("double") for x in query_vec])


def brute_force_topk(
    vectors: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The float array feeds ``cosine_similarity`` directly — element
    casts happen inline in the zip_with lambda (a transform-cast
    wrapper would materialize an extra array per row; see the PERF
    note in functions/vectors.py).
    """
    sim = cosine_similarity(F.col(vec_col), _query_lit(query_vec))
    return (
        vectors.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    vectors: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    n_probe: int = 2,
) -> DataFrame:
    """IVF-style ANN: probe only the ``n_probe`` inverted-file cells
    whose representative vector is closest to the query, then exact
    cosine top-k within those cells.

    ``cell_col`` is the coarse-quantizer cell id (here the fixture's
    ``label`` column; in production the output of k-means).  The cell
    REPRESENTATIVE is the member with the minimum id — deterministic
    and order-independent, so the probe decision is exactly
    reproducible in SQL (a mean centroid depends on float summation
    order across rows, which neither engine guarantees).

    Scale: representatives are ~n_cells rows (collected to the driver
    once, like a centroid codebook); the data scan prunes to the
    probed cells — with the table partitioned by cell this is
    partition pruning, reading n_probe/n_cells of the data.
    """
    reps = (
        vectors.groupBy(cell_col)
        .agg(F.min(id_col).alias("__rep_id"))
        .join(
            vectors.select(
                F.col(id_col).alias("__rep_id"), F.col(vec_col).alias("__rv")
            ),
            "__rep_id",
        )
    )
    qlit = _query_lit(query_vec)
    probe_rows = (
        reps.select(
            cell_col,
            cosine_similarity(F.col("__rv"), qlit).alias("__sim"),
        )
        .orderBy(F.col("__sim").desc(), F.col(cell_col))
        .limit(n_probe)
        .collect()
    )
    probed = [r[cell_col] for r in probe_rows]
    return (
        vectors.filter(F.col(cell_col).isin(probed))
        .select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), qlit).alias("sim"),
            F.col(cell_col).alias("cell"),
        )
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_bucket_topk(
    vectors: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
) -> DataFrame:
    """ANN top-k: search only the query's sign-projection bucket.

    Planes here are axis-subset sums (sum of a deterministic md5-chosen
    third of the dims) — simple, portable, and bucket-balanced on
    roughly-isotropic embeddings.
    """
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import md5_int

    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def plane_sign(vec: Column, j: int) -> Column:
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    F.sequence(F.lit(0), F.size(vec) - 1),
                    lambda i: F.when(
                        md5_int(
                            F.concat(
                                F.lit(f"p{j}:"), i.cast("string")
                            )
                        )
                        % 3
                        == 0,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0)),
                ),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))

    bucket_of = lambda vec: sum(  # noqa: E731
        [plane_sign(vec, j) for j in range(n_planes)], F.lit(0)
    ).cast("int")

    with_bucket = vectors.select(
        F.col(id_col), dvec.alias("__v"), bucket_of(dvec).alias("bucket")
    )
    qlit = _query_lit(query_vec)
    # driver-side: compute the query's bucket once (tiny expression on
    # a 1-row frame — no data scan)
    qrow = (
        vectors.sparkSession.range(1)
        .select(bucket_of(qlit).alias("b"))
        .collect()[0]
    )
    return (
        with_bucket.filter(F.col("bucket") == int(qrow.b))
        .select(
            F.col(id_col),
            cosine_similarity(F.col("__v"), qlit).alias("sim"),
            "bucket",
        )
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )
