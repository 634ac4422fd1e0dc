"""Product quantization (PQ) for memory-bounded vector search.

The public recipe (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI'11, and FAISS's IVF-PQ): split each vector
into ``m`` subspaces, k-means each subspace to ``ksub`` centroids,
and store every vector as ``m`` one-byte centroid ids — a 256-dim
float32 embedding (1 KiB) compresses to 8-32 bytes.  Search scores
codes against a query with Asymmetric Distance Computation (ADC):
one driver-computed ``m × ksub`` lookup table of query-to-centroid
squared distances, then each row's distance is ``m`` table lookups.

This is the piece the engine's ANN surface was missing at 100 TB:
brute-force and IVF both ship the RAW vectors through scan or
probe; PQ codes shrink the scanned bytes ~50x, so the exhaustive
ADC pass stays I/O-bound-cheap and the raw vectors are touched only
for the final re-rank of a small candidate set.

Spark-first layout:

- **Train** (:func:`train_pq`): ONE hash-ordered bounded-sample job,
  then ``m`` deterministic numpy Lloyd's runs driver-side — the
  standard PQ posture (codebooks need thousands of representative
  vectors, not the corpus); nothing scales with corpus size.
- **Encode** (:func:`encode_pq`): map-only Arrow pass — the batch's
  vectors stack into one numpy matrix, each subspace's assignment is
  one vectorized argmin, codes pack to a BinaryType column of ``m``
  bytes.  Zero shuffle at any scale.
- **Search** (:func:`pq_topk`): map-only ADC (one fancy-index gather
  per batch) + ``TakeOrderedAndProject`` heap — no global sort, no
  shuffle of codes.  :func:`pq_topk_rerank` re-scores a candidate
  set against the raw vectors with the engine's exact sequential
  cosine, the production ADC-prefilter + exact-rerank recipe.

On unit-norm vectors (the engine's embedder L2-normalizes) squared
L2 is ``2 - 2·cos``, so ADC's L2 ranking equals the cosine ranking.

Reference parity note: the reference's vector surface stops at
upsert (S3VectorTargetMapper.java:87-177) — quantized search is part
of the training-data-pipeline extension surface (SURVEY.md §2.2
"Similarity/ANN").
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, DoubleType

__all__ = [
    "PQModel",
    "train_pq",
    "train_pq_distributed",
    "encode_pq",
    "pq_topk",
    "pq_topk_rerank",
    "save_pq_model",
    "load_pq_model",
]


@dataclass(frozen=True)
class PQModel:
    """``codebooks[s][c]`` = centroid ``c`` of subspace ``s``
    (float64[m, ksub, dsub])."""

    codebooks: np.ndarray
    dims: int

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def ksub(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    def __post_init__(self) -> None:
        if self.codebooks.ndim != 3:
            raise ValueError("codebooks must be [m, ksub, dsub]")
        if self.m * self.dsub != self.dims:
            raise ValueError(
                f"m*dsub = {self.m}*{self.dsub} != dims {self.dims}"
            )
        if self.ksub > 256:
            raise ValueError("ksub > 256 does not fit one byte per code")


def _lloyd_np(
    x: np.ndarray, k: int, n_iter: int, tol: float = 1e-4
) -> np.ndarray:
    """Deterministic numpy Lloyd's: farthest-point seeding from the
    first row, inertia-plateau early stop — the same discipline as
    ``kmeans_fit``, on an in-memory sample."""
    seeds = np.empty((k, x.shape[1]))
    seeds[0] = x[0]
    d = ((x - seeds[0]) ** 2).sum(1)
    for j in range(1, k):
        seeds[j] = x[int(d.argmax())]
        d = np.minimum(d, ((x - seeds[j]) ** 2).sum(1))
    cents = seeds
    prev = None
    for _ in range(n_iter):
        dist = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = dist.argmin(1)
        inertia = float(dist[np.arange(len(x)), assign].sum())
        new = cents.copy()
        for j in range(k):
            mask = assign == j
            if mask.any():
                new[j] = x[mask].mean(0)
        cents = new
        if prev is not None and prev > 0 and (prev - inertia) / prev < tol:
            break
        prev = inertia
    return cents


def train_pq(
    vectors: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 1 << 14,
) -> PQModel:
    """Fit ``m`` subspace codebooks on a DETERMINISTIC bounded sample
    trained driver-side — the standard PQ posture (FAISS trains its
    quantizers on a sample too): codebook quality needs thousands of
    representative vectors, not the corpus, so one
    hash-ordered-sample job replaces ~m*(ksub + iters) distributed
    aggregation jobs.  The sample is ordered by ``md5(id)`` — a pure
    function of ids, so training is reproducible across runs,
    partitionings, and cluster sizes; the collected matrix is
    ≤ ``sample_rows`` × dims float64 (16 MiB at the default 16k × 128)
    — driver-bounded by construction.  Each subspace then runs
    deterministic numpy Lloyd's (farthest-point seeding, inertia
    early stop).  ``dims`` must divide evenly by ``m``."""
    sample = (
        vectors.select(
            F.col(vec_col).alias("__v"),
            F.md5(F.col(id_col).cast("string")).alias("__h"),
        )
        .orderBy("__h")
        .limit(sample_rows)
        .collect()
    )
    if not sample:
        raise ValueError("empty vector table")
    dims = len(sample[0]["__v"])
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m {m}")
    if len(sample) < ksub:
        raise ValueError(f"need >= {ksub} vectors, got {len(sample)}")
    dsub = dims // m
    x = np.asarray(
        [list(r["__v"]) for r in sample], dtype=np.float64
    ).reshape(len(sample), m, dsub)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for s in range(m):
        books[s] = _lloyd_np(np.ascontiguousarray(x[:, s, :]), ksub, n_iter)
    return PQModel(codebooks=books, dims=dims)


def _books_lit(books: list[list[list[float]]]):
    """The full [m][ksub][dsub] codebook as ONE nested literal array
    expression (repr(float) round-trips the exact double)."""
    subs = []
    for book in books:
        cents = ", ".join(
            "array(" + ", ".join(f"CAST({float(x)!r} AS DOUBLE)" for x in c) + ")"
            for c in book
        )
        subs.append(f"array({cents})")
    return F.expr("array(" + ", ".join(subs) + ")")


def _sq_dist_col(sv, cent):
    """Sequential-fold squared L2 between a subvector column and a
    centroid array column (elements cast inline)."""
    return F.aggregate(
        F.zip_with(
            sv, cent, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_iteration_means(exploded: DataFrame, books, dsub: int) -> DataFrame:
    """One Lloyd iteration's assignment + per-(subspace, cell) means
    for ALL ``m`` subspaces in a single aggregation: each exploded
    row (subspace id, subvector) computes its distance array against
    its OWN subspace's centroids (one nested-literal lookup), takes
    the argmin (ties -> lowest cell, like numpy), and ONE
    groupBy(subspace, cell) produces the dsub component means, the
    member count, and the inertia contribution.  Exactly one
    exchange per iteration (pinned in tests/test_pq.py)."""
    lit = _books_lit(books)
    darr = F.transform(
        F.element_at(lit, F.col("__s") + 1),
        lambda c: _sq_dist_col(F.col("__sv"), c),
    )
    cell = (F.array_position(darr, F.array_min(darr)) - 1).cast("int")
    return (
        exploded.select(
            "__s",
            "__sv",
            cell.alias("__c"),
            F.array_min(darr).alias("__d"),
        )
        .groupBy("__s", "__c")
        .agg(
            *[
                F.avg(F.element_at("__sv", d + 1).cast("double")).alias(f"c{d}")
                for d in range(dsub)
            ],
            F.count("*").alias("__cnt"),
            F.sum("__d").alias("__inertia"),
        )
    )


def train_pq_distributed(
    vectors: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float | None = 1e-4,
) -> PQModel:
    """Opt-in DISTRIBUTED codebook training over the FULL table — for
    training budgets past what the driver-side sample path should
    hold (``train_pq`` stays the default: FAISS-style sample training
    is the right posture almost always).

    Mirrors :func:`_lloyd_np`'s discipline so the two trainers agree
    on small data (equivalence-tested): seed 0 is the row with the
    lowest ``md5(id)`` (the sample trainer's ``x[0]`` under its hash
    ordering), farthest-point picks break ties toward the lower hash,
    assignment argmin breaks toward the lower cell, inertia-plateau
    early stop at the same ``tol`` (``None`` disables).

    Scale shape:
    - rows explode once into (subspace, subvector) — map-only, then
      ONE persisted frame feeds every step;
    - every seeding step is one groupBy(subspace) max_by — ksub-1
      tiny shuffles of m rows each;
    - every Lloyd iteration is ONE groupBy(subspace, cell) — a
      single exchange moving m·ksub partial rows per task
      (:func:`_pq_iteration_means`, plan-pinned);
    - only codebook-sized results (m × ksub × dsub) ever collect.
    """
    first = vectors.select(F.col(vec_col)).first()
    if first is None:
        raise ValueError("empty vector table")
    dims = len(first[0])
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m {m}")
    if vectors.limit(ksub).count() < ksub:
        raise ValueError(f"need >= {ksub} vectors")
    dsub = dims // m

    hid = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    subvecs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.slice(F.col(vec_col), s * dsub + 1, dsub),
    )
    exploded = (
        vectors.select(hid.alias("__hid"), subvecs.alias("__svs"))
        .select("__hid", F.posexplode("__svs").alias("__s", "__sv"))
        .persist()
    )
    try:
        # seed 0: the lowest-hash row's subvectors (== _lloyd_np's
        # x[0] under the sample's hash ordering)
        row0 = (
            exploded.groupBy("__s")
            .agg(F.min_by("__sv", "__hid").alias("__sv"))
            .collect()
        )
        books: list[list[list[float]]] = [[] for _ in range(m)]
        for r in row0:
            books[r["__s"]].append([float(x) for x in r["__sv"]])
        for _ in range(1, ksub):
            lit = _books_lit(books)
            mind = F.array_min(
                F.transform(
                    F.element_at(lit, F.col("__s") + 1),
                    lambda c: _sq_dist_col(F.col("__sv"), c),
                )
            )
            picks = (
                exploded.select("__s", "__sv", mind.alias("__d"), "__hid")
                .groupBy("__s")
                .agg(
                    F.max_by(
                        "__sv", F.struct(F.col("__d"), -F.col("__hid"))
                    ).alias("__sv")
                )
                .collect()
            )
            for r in picks:
                books[r["__s"]].append([float(x) for x in r["__sv"]])

        prev_inertia: float | None = None
        for _ in range(n_iter):
            rows = _pq_iteration_means(exploded, books, dsub).collect()
            new = [
                [list(books[s][c]) for c in range(ksub)] for s in range(m)
            ]
            inertia = 0.0
            for r in rows:
                new[r["__s"]][r["__c"]] = [r[f"c{d}"] for d in range(dsub)]
                inertia += float(r["__inertia"])
            books = new
            if tol is not None and prev_inertia is not None and prev_inertia > 0:
                if (prev_inertia - inertia) / prev_inertia < tol:
                    break
            prev_inertia = inertia
    finally:
        exploded.unpersist()
    return PQModel(
        codebooks=np.asarray(books, dtype=np.float64), dims=dims
    )


def _stack(vecs: pd.Series, dims: int) -> np.ndarray:
    return np.vstack(
        [np.asarray(v, dtype=np.float64) for v in vecs]
    ).reshape(len(vecs), dims)


def encode_pq(
    df: DataFrame,
    model: PQModel,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Append the ``m``-byte PQ code (BinaryType) — map-only Arrow
    pass, one vectorized argmin per subspace per batch."""
    books = model.codebooks
    m, dsub, dims = model.m, model.dsub, model.dims

    @F.pandas_udf(BinaryType())
    def encode(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        x = _stack(vecs, dims).reshape(len(vecs), m, dsub)
        codes = np.empty((len(vecs), m), dtype=np.uint8)
        for s in range(m):
            # ||x - c||^2 over ksub centroids: (n, ksub) via broadcast
            d = ((x[:, s, None, :] - books[s][None, :, :]) ** 2).sum(-1)
            codes[:, s] = d.argmin(1)
        return pd.Series([c.tobytes() for c in codes])

    return df.withColumn(code_col, encode(F.col(vec_col)))


def pq_topk(
    codes: DataFrame,
    model: PQModel,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """ADC top-k over PQ codes: returns ``(id_col, adc_dist)`` with
    the ``k`` smallest approximate squared L2 distances (ascending;
    ties break on id).  The lookup table (m × ksub float64 — a few
    KiB) ships in the UDF closure; per row the distance is ``m``
    gathers + a sum, vectorized per Arrow batch.  Executes as a
    per-partition heap (TakeOrderedAndProject) — no global sort."""
    q = np.asarray(list(query_vec), dtype=np.float64)
    if q.shape != (model.dims,):
        raise ValueError(f"query dims {q.shape} != {model.dims}")
    sub_q = q.reshape(model.m, model.dsub)
    table = ((model.codebooks - sub_q[:, None, :]) ** 2).sum(-1)
    m = model.m
    arange_m = np.arange(m)

    @F.pandas_udf(DoubleType())
    def adc(code_bytes: pd.Series) -> pd.Series:
        if not len(code_bytes):
            return pd.Series([], dtype=np.float64)
        mat = np.frombuffer(
            b"".join(code_bytes), dtype=np.uint8
        ).reshape(len(code_bytes), m)
        return pd.Series(table[arange_m, mat].sum(1))

    return (
        codes.select(F.col(id_col), adc(F.col(code_col)).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def pq_topk_rerank(
    vectors: DataFrame,
    model: PQModel,
    query_vec,
    k: int = 10,
    refine: int = 10,
    min_candidates: int = 512,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Production PQ search: ADC prefilter to
    ``max(k*refine, min_candidates)`` candidates over the compressed
    codes, then EXACT cosine re-rank of only those candidates against
    the raw vectors (same sequential-double cosine as
    ``brute_force_topk``, so whenever the candidate set covers the
    true top-k the output is bit-identical to exact search).  Returns
    ``(id_col, sim)`` descending.

    ``codes`` supplies a precomputed code table (the at-scale shape:
    encode once, search many); by default codes are derived from
    ``vectors`` inline.  The candidate join is id-only — raw vectors
    are fetched for ~k*refine rows, never scanned en masse with the
    query."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.similarity import brute_force_topk

    n_cand = max(k * refine, min_candidates)
    if codes is None:
        codes = encode_pq(vectors, model, vec_col=vec_col, code_col=code_col)
    cand_ids = pq_topk(
        codes, model, query_vec, k=n_cand, id_col=id_col, code_col=code_col
    ).select(id_col)
    candidates = vectors.join(cand_ids, id_col)
    return brute_force_topk(
        candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col
    )


def save_pq_model(spark, model: PQModel, path: str) -> None:
    """Persist as a parquet of (subspace, centroid, component, value)
    rows plus a one-row meta file — written THROUGH Spark (same
    portable layout contract as ``save_quality_model``), so encode
    jobs on other sessions/clusters can load it from any
    Hadoop-visible filesystem."""
    import json as _json

    rows = [
        (s, c, d, float(model.codebooks[s, c, d]))
        for s in range(model.m)
        for c in range(model.ksub)
        for d in range(model.dsub)
    ]
    spark.createDataFrame(
        rows, "subspace int, centroid int, component int, value double"
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    meta = _json.dumps(
        {"m": model.m, "ksub": model.ksub, "dsub": model.dsub, "dims": model.dims}
    )
    spark.createDataFrame([(meta,)], "meta string").repartition(
        1
    ).write.mode("overwrite").text(f"{path}/meta")


def load_pq_model(spark, path: str) -> PQModel:
    import json as _json

    meta = _json.loads(spark.read.text(f"{path}/meta").collect()[0]["value"])
    books = np.zeros(
        (int(meta["m"]), int(meta["ksub"]), int(meta["dsub"])),
        dtype=np.float64,
    )
    for r in spark.read.parquet(f"{path}/codebooks").collect():
        books[r["subspace"], r["centroid"], r["component"]] = r["value"]
    return PQModel(codebooks=books, dims=int(meta["dims"]))
