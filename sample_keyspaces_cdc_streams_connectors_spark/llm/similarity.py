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

import hashlib
import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.functions.vectors import dot, l2_norm


def _query_arr_sql(query_vec: Sequence[float]) -> str:
    """The query vector as SQL array text (see :func:`_query_lit` for
    why ``repr(float)`` round-trips bit-identically)."""
    return (
        "array("
        + ", ".join(f"CAST({float(x)!r} AS DOUBLE)" for x in query_vec)
        + ")"
    )


def _cosine_to_query_sql(
    vec: str, query_vec: Sequence[float], qnorm: float
) -> str:
    """SQL-text twin of :func:`_cosine_to_query` (r14 construction-
    cost optimization: one parse instead of ~10 HOF builds)."""
    from sample_keyspaces_cdc_streams_connectors_spark.functions.vectors import dot_sql, l2_norm_sql

    denom = f"{l2_norm_sql(vec)} * CAST({float(qnorm)!r} AS DOUBLE)"
    return (
        f"CASE WHEN {denom} > 0 "
        f"THEN {dot_sql(vec, _query_arr_sql(query_vec))} / ({denom}) "
        "ELSE 0.0D END"
    )


def _query_lit(query_vec: Sequence[float]) -> Column:
    """The query vector as ONE literal array expression.

    Built via ``F.expr`` with a single SQL string rather than
    ``F.array(*[F.lit(x) ...])``: each ``F.lit``/``cast`` is a py4j
    round-trip, and a 64-dim query vector times several consumers was
    ~0.5 s of driver chatter per query build.  ``repr(float)`` is the
    shortest round-trip decimal, which Java's ``Double.parseDouble``
    maps back to the identical IEEE-754 double, so the plan is
    bit-identical to the lit-by-lit form."""
    elems = ", ".join(f"CAST({float(x)!r} AS DOUBLE)" for x in query_vec)
    return F.expr(f"array({elems})")


def _query_norm(query_vec: Sequence[float]) -> float:
    """L2 norm of the query computed driver-side, bit-identical to
    ``l2_norm(_query_lit(...))``: the literal's elements are exact
    doubles, Python's float ops are the same IEEE-754 ops in the same
    left-fold order, and ``math.sqrt`` is correctly rounded like the
    JVM's.  Evaluating this ONCE here instead of per scanned row
    removes a constant-yet-recomputed interpreted aggregate from the
    hot path (at 100 TB: one sqrt vs billions)."""
    acc = 0.0
    for x in query_vec:
        xx = float(x)
        acc = acc + xx * xx
    return math.sqrt(acc)


def _cosine_to_query(
    vec: Column, qlit: Column, qnorm: float
) -> Column:
    """cos(vec, query) with the query's norm pre-folded to a literal;
    same zero-norm guard (and bit pattern) as ``cosine_similarity``."""
    denom = l2_norm(vec) * F.lit(qnorm)
    return F.when(denom > 0, dot(vec, qlit) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    vectors: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The float array feeds the dot product directly — element casts
    happen inline in the zip_with lambda (a transform-cast wrapper
    would materialize an extra array per row; see the PERF note in
    functions/vectors.py) — and the query's own norm is folded to a
    driver-side literal instead of being re-derived per row.
    """
    sim_sql = _cosine_to_query_sql(
        f"`{vec_col}`", query_vec, _query_norm(query_vec)
    )
    return (
        vectors.selectExpr(
            f"`{id_col}`",
            *[f"`{c}`" for c in extra_cols],
            f"{sim_sql} AS sim",
        )
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
    qnorm = _query_norm(query_vec)
    probe_rows = (
        reps.select(
            cell_col,
            _cosine_to_query(F.col("__rv"), qlit, qnorm).alias("__sim"),
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
            _cosine_to_query(F.col(vec_col), qlit, qnorm).alias("sim"),
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

    PERF: the md5-derived ±1 sign pattern depends only on (plane,
    dim index), so it is derived ONCE driver-side (``hashlib.md5`` ==
    Spark's ``md5`` byte-for-byte) and enters the plan as a literal
    double array — previously each scanned row re-hashed
    n_planes × dims md5s interpreted (512k hashes per 2000-row scan).
    Projections stay sequential-double zip_with folds, so bucket ids
    and the DuckDB oracle (which re-derives the same signs in SQL) are
    unchanged.  Precondition: uniform dims == len(query_vec).
    """

    def plane_signs(j: int) -> list[float]:
        signs = []
        for i in range(len(query_vec)):
            h = hashlib.md5(f"p{j}:{i}".encode()).hexdigest()
            signs.append(1.0 if int(h[:15], 16) % 3 == 0 else -1.0)
        return signs

    def plane_sign_sql(vec: str, j: int) -> str:
        # whole plane projection as SQL text (r14 — formerly one
        # F.expr for the sign array but Column-built HOFs around it;
        # ~20-60 ms py4j per HOF construction)
        signs = ", ".join(
            "1.0D" if s > 0 else "-1.0D" for s in plane_signs(j)
        )
        proj = (
            f"aggregate(zip_with({vec}, array({signs}), "
            "(x, s) -> x * s), 0.0D, (acc, v) -> acc + v)"
        )
        return f"(CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END)"

    dvec_sql = f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE))"
    bucket_sql = "CAST(0 + " + " + ".join(
        plane_sign_sql(dvec_sql, j) for j in range(n_planes)
    ) + " AS INT)"
    with_bucket = vectors.selectExpr(
        f"`{id_col}`", f"{dvec_sql} AS __v", f"{bucket_sql} AS bucket"
    )
    qnorm = _query_norm(query_vec)
    # the query's bucket is a constant: fold it in PYTHON driver-side
    # (same left-to-right IEEE-754 sum as the zip_with/aggregate the
    # rows use, so bit-identical) instead of launching a Spark job on
    # a 1-row frame just to evaluate a literal expression — measured
    # 1.2-2.0 s of the query's wall time at sf0.1 was that job's
    # scheduling + big-literal-tree analysis
    qbucket = 0
    for j in range(n_planes):
        proj = 0.0
        for x, s in zip(query_vec, plane_signs(j)):
            proj = proj + float(x) * s
        if proj > 0:
            qbucket += 1 << j
    return (
        with_bucket.filter(F.col("bucket") == qbucket)
        .selectExpr(
            f"`{id_col}`",
            f"{_cosine_to_query_sql('__v', query_vec, qnorm)} AS sim",
            "bucket",
        )
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def _seq_cosine_block(v, qmat, qnorms):
    """(rows × queries) cosine matrix via DIMENSION-sequential left
    folds: each (row, query) scalar chain adds ``v_t·q_t`` in element
    order and the row norm folds ``v_t²`` the same way — the identical
    IEEE op sequence as :func:`functions.vectors.dot` / ``l2_norm``
    and a ``list_sum`` SQL oracle, so every sim is bit-equal to the
    JVM single-query path (zero-denominator guard included).
    ``qmat`` holds RAW query vectors; ``qnorms`` their driver-side
    ``_query_norm`` values."""
    import numpy as np

    d = v.shape[1]
    dotm = np.zeros((v.shape[0], qmat.shape[0]))
    nsq = np.zeros(v.shape[0])
    for t in range(d):
        vt = v[:, t]
        nsq = nsq + vt * vt
        dotm = dotm + vt[:, None] * qmat[None, :, t]
    denom = np.sqrt(nsq)[:, None] * qnorms[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(denom > 0, dotm / denom, 0.0)


#: default executable bound on bulk query-table size (r10 — the
#: bulk kernels collect the query table driver-side under a "queries
#: are a work list, not a corpus" contract; until r10 that contract
#: was documentation only, so passing a corpus as the query table
#: OOMed the driver instead of failing fast, unlike rrf_fuse's
#: executable max_input_rows precedent)
DEFAULT_MAX_QUERIES = 65_536


def _collect_bounded_queries(
    queries: "DataFrame",
    cols: list[str],
    max_queries: int | None,
    fn_name: str,
) -> list:
    """Collect the bulk query work list, failing fast (one
    ``limit(max+1)`` collect — never a full corpus pull) when it
    exceeds ``max_queries``.  ``None`` disables the bound."""
    sel = queries.select(*cols)
    if max_queries is None:
        rows = sel.collect()
    else:
        if max_queries < 1:
            raise ValueError(
                f"max_queries must be >= 1 or None, got {max_queries}"
            )
        rows = sel.limit(int(max_queries) + 1).collect()
        if len(rows) > max_queries:
            raise ValueError(
                f"{fn_name}: query table exceeds max_queries="
                f"{int(max_queries)} rows — bulk kernels collect "
                "queries driver-side (a work list, not a corpus); "
                "split the query table or raise max_queries "
                "explicitly (None disables the bound)"
            )
    if not rows:
        raise ValueError("queries table is empty")
    return rows


def brute_force_topk_many(
    vectors: DataFrame,
    queries: "DataFrame | list | tuple",
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    check_unique_ids: bool = True,
    exact_cos: bool = False,
    max_queries: int | None = DEFAULT_MAX_QUERIES,
) -> DataFrame:
    """BULK exact cosine top-k: every row of a query TABLE answered in
    ONE pass over the vector table — the dense mirror of
    ``llm.retrieval.bm25_topk_many`` (a batch-retrieval workload means
    thousands of query vectors, which must not mean thousands of
    jobs).

    ``exact_cos=True`` switches the kernel to DIMENSION-sequential
    accumulation (the ``functions.vectors.dot_pandas`` discipline):
    dot and norms fold left-to-right over elements in double
    precision, so every sim is BIT-identical to the single-query JVM
    path and to an identically-written SQL oracle — the cross-engine
    gate mode.  The default matmul kernel is faster (one BLAS call
    per batch) and agrees to ~1e-15; rankings match except under
    adversarial sub-ulp ties.

    Scale shape:

    - the query table collects driver-side into one (n_q × dims)
      unit-normalized ndarray (bounded by contract — queries are a
      work list, not a corpus) and rides into an Arrow kernel as a
      broadcast closure;
    - ONE ``mapInPandas`` pass scores each Arrow batch against ALL
      queries as a single (batch × dims) @ (dims × n_q) matmul and
      emits only each query's per-batch top-k (argpartition heaps) —
      ≤ k·n_q rows per batch leave the kernel, never |vectors|·n_q;
    - the global answer is one rank-over-window over those bounded
      candidates (tiny: batches · k · n_q rows).

    Scores are cosine in double precision; within-batch ties break to
    the lower id, and the final window repeats the (sim desc, id asc)
    total order, matching :func:`brute_force_topk`'s ranking (pinned
    equivalent in tests).  Returns ``(query_id_col, id_col, sim,
    rank)`` with rank 1..k per query — the bulk-BM25 output shape, so
    the two feed :func:`~sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval.rrf_fuse`
    per-query hybrid fusion directly.  ``query_id_col`` must be
    unique (checked like the BM25 twin; disable with
    ``check_unique_ids=False``).  ``max_queries`` (r10) makes the
    bounded-work-list contract executable: the collect stops at
    ``max_queries + 1`` rows and raises instead of pulling a
    corpus-sized frame onto the driver (``None`` disables).

    ``queries`` may also be a driver-resident list/tuple of
    ``(query_id, vector)`` pairs (r14): a caller that already holds
    its work list skips the per-invocation collect job; the same
    ``max_queries`` bound and id-uniqueness contract apply."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Row

    if isinstance(queries, (list, tuple)) and not isinstance(queries, Row):
        # r14: driver-resident work list — a caller that already holds
        # its (query_id, vector) pairs (e.g. read from a parquet
        # footer) passes them directly, skipping the per-invocation
        # Spark collect job the DataFrame form pays (~0.2 s).  Same
        # bounds and uniqueness contract, enforced driver-side.
        # r15 (ADVICE r14): a pyspark Row IS a tuple subclass — a Row
        # passed by mistake must not be silently iterated as a work
        # list, so Rows are excluded from the work-list form.
        qrows = list(queries)
        if not qrows:
            raise ValueError(
                "queries is empty (work list or queries table)"
            )
        if max_queries is not None and len(qrows) > max_queries:
            raise ValueError(
                f"brute_force_topk_many: query table exceeds "
                f"max_queries={int(max_queries)} rows — bulk kernels "
                "collect queries driver-side (a work list, not a "
                "corpus); split the query table or raise max_queries "
                "explicitly (None disables the bound)"
            )
        if check_unique_ids:
            seen: set = set()
            for r in qrows:
                if r[0] in seen:
                    raise ValueError(
                        f"brute_force_topk_many requires unique "
                        f"{query_id_col!r} values; {r[0]!r} appears "
                        "more than once"
                    )
                seen.add(r[0])
    else:
        if check_unique_ids:
            dup = (
                queries.groupBy(query_id_col)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"brute_force_topk_many requires unique "
                    f"{query_id_col!r} values; {dup[0][query_id_col]!r} "
                    f"appears {dup[0]['count']} times"
                )
        qrows = _collect_bounded_queries(
            queries,
            [query_id_col, query_vec_col],
            max_queries,
            "brute_force_topk_many",
        )
    qids = np.asarray([r[0] for r in qrows], dtype=np.int64)
    qmat = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    if exact_cos:
        # the single-query path's own norm derivation, per query
        qnorm = np.asarray(
            [_query_norm(list(r[1])) for r in qrows], dtype=np.float64
        )
        qunit = qmat  # raw vectors; normalization happens in the fold
    else:
        qnorm = np.sqrt((qmat * qmat).sum(axis=1))
        qnorm[qnorm == 0.0] = 1.0
        qunit = qmat / qnorm[:, None]

    id_field = vectors.schema[id_col]
    out_schema = StructType(
        [
            StructField(query_id_col, LongType(), False),
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("sim", DoubleType(), True),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_q = qunit.shape[0]
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            v = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf[vec_col]]
            )
            if exact_cos:
                sims = _seq_cosine_block(v, qunit, qnorm)
            else:
                norms = np.sqrt((v * v).sum(axis=1))
                norms[norms == 0.0] = 1.0
                sims = (v / norms[:, None]) @ qunit.T  # (b × n_q)
            kk = min(k, len(ids))
            # per-query within-batch top-k, ties to the lower id:
            # lexsort on (id asc) then stable argsort on -sim keeps
            # the lower id first among equal sims
            order = np.argsort(ids, kind="stable")
            sims_o = sims[order]
            ids_o = ids[order]
            out_q: list = []
            out_i: list = []
            out_s: list = []
            for j in range(n_q):
                col = sims_o[:, j]
                top = np.argsort(-col, kind="stable")[:kk]
                out_q.extend([qids[j]] * len(top))
                out_i.extend(ids_o[top])
                out_s.extend(col[top])
            yield pd.DataFrame(
                {
                    query_id_col: pd.Series(out_q, dtype="int64"),
                    id_col: out_i,
                    "sim": pd.Series(out_s, dtype="float64"),
                }
            )

    candidates = vectors.select(id_col, vec_col).mapInPandas(
        score, out_schema
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("sim"), F.asc(id_col)
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )
