"""Persisted IVF index: k-means cells as a partitioned table layout.

`llm.similarity.ivf_topk` probes cells of an in-memory frame; this
module makes the claimed production layout real: vectors are written
PARTITIONED BY their k-means cell with the codebook stored alongside,
so a query (a) picks its probe cells driver-side from the codebook —
no Spark job — and (b) scans ONLY the probed cells' partitions.
Partition pruning is the entire point: with k cells and n_probe
probes the scan reads ~n_probe/k of the data (pinned by plan test).

Reference tie-in: the reference ships vectors to the S3 Vectors
service and delegates indexing (S3VectorTargetMapper.java:87-177); a
native engine owns the layout instead.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.kmeans import kmeans_assign, kmeans_fit

CODEBOOK_FILE = "_codebook.json"

#: written by llm.maintenance immediately BEFORE a destructive layout
#: swap and removed only after the swap (data + codebook/stats)
#: completes — its presence on load means a maintenance op crashed
#: mid-swap and the layout may be inconsistent (r10, review finding:
#: an interrupted rebalance could otherwise probe a new cell layout
#: with the stale codebook and return wrong results undetected).
MAINTENANCE_MARKER = "_maintenance_inprogress.json"


def _marker_path(path: str) -> str:
    return f"{path.rstrip('/')}/{MAINTENANCE_MARKER}"


def check_no_pending_swap(
    path: str, spark: SparkSession | None = None
) -> None:
    """Raise if a maintenance swap marker is present at ``path`` —
    called by every loader that interprets the layout (codebook,
    BM25 stats, dedup-index probes)."""
    spark = spark or SparkSession.getActiveSession()
    marker = _marker_path(path)
    if spark is None:
        import os

        present = os.path.exists(marker)
    else:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(marker)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        present = fs.exists(hpath)
    if present:
        raise RuntimeError(
            f"index at {path!r} has an unfinished maintenance swap "
            f"({MAINTENANCE_MARKER} present): a compact/rebalance was "
            "interrupted mid-swap and the layout may be inconsistent. "
            "Recover manually: '*.__old' sibling directories hold the "
            "pre-swap data (rename them back to roll the swap back); "
            "the '*__compact_tmp'/'*__rebalance_tmp' directory holds "
            "the complete replacement layout (move its directories in "
            "and install the codebook recorded inside the marker file "
            "to roll forward).  Delete the marker once consistent."
        )


def _cell_layout(labeled, k: int, files_per_cell: int = 1):
    """One narrow shuffle keyed by the cell before partitionBy —
    without it every writing task emits a file into every cell it
    holds (shuffle_partitions × k files per write/append; the r9
    maintenance stress measured naive appends degrading probes on
    listing/footer cost alone).  files_per_cell=1 puts each cell
    wholly in one task; >1 salts by a hash of the whole row's id-free
    columns at the caller's choosing — callers here salt by id."""
    from pyspark.sql import functions as _F

    if files_per_cell == 1:
        return labeled.repartition(k, "cell")
    return (
        labeled.withColumn(
            "__salt",
            _F.pmod(
                _F.xxhash64(_F.col(labeled.columns[0])),
                _F.lit(files_per_cell),
            ),
        )
        .repartition(k * files_per_cell, "cell", "__salt")
        .drop("__salt")
    )


def _codebook_path(path: str) -> str:
    return f"{path.rstrip('/')}/{CODEBOOK_FILE}"


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small text file through the Hadoop FileSystem API so
    the index layout works on ANY supported URI (s3a://, hdfs://,
    file:/...) — a driver-local ``open()`` would silently write the
    codebook to local disk while the vectors land on the object
    store."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, path: str) -> str:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(hpath)
    try:
        sink = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, sink, 4096, False)
        return bytes(sink.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def write_ivf_index(
    vectors: DataFrame,
    path: str,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float | None = 1e-4,
    exact_means: bool = False,
    portable_hash: bool = False,
    seed_mode: str = "farthest",
) -> list[list[float]]:
    """Fit the coarse quantizer, label every vector, and write the
    partitioned layout + codebook.  Returns the codebook.
    ``exact_means`` / ``portable_hash`` / ``tol`` / ``seed_mode`` pass
    through to :func:`kmeans_fit` (bit-reproducible training — the
    oracle-gated configuration; ``seed_mode="parallel"`` is the
    production-k initializer whose job count is independent of the
    cell count).

    Scale: the write shuffles once on the cell label (partitionBy);
    each cell's files hold only that cell's vectors, so probes prune
    at the directory level — the same mechanism as the time-partitioned
    CDC sink layout (S3TargetMapper.java:84-136 analog)."""
    centroids = kmeans_fit(
        vectors,
        k=k,
        n_iter=n_iter,
        id_col=id_col,
        vec_col=vec_col,
        tol=tol,
        exact_means=exact_means,
        portable_hash=portable_hash,
        seed_mode=seed_mode,
    )
    labeled = kmeans_assign(
        vectors, centroids, id_col=id_col, vec_col=vec_col, cell_col="cell"
    )
    _cell_layout(labeled, k).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)
    _write_text(
        vectors.sparkSession, _codebook_path(path), json.dumps(centroids)
    )
    return centroids


def load_codebook(
    path: str, spark: SparkSession | None = None
) -> list[list[float]]:
    """Read the codebook through the same Hadoop FileSystem as the
    vectors (falls back to the active session when none is passed).
    Refuses to load mid-maintenance-swap (r10) — a stale codebook
    over a half-swapped cell layout would probe wrong silently."""
    spark = spark or SparkSession.getActiveSession()
    check_no_pending_swap(path, spark)
    if spark is None:  # no JVM — local filesystem only
        with open(_codebook_path(path), encoding="utf-8") as fh:
            return json.load(fh)
    return json.loads(_read_text(spark, _codebook_path(path)))


def _probe_cells(
    query_vec: Sequence[float], centroids: list[list[float]], n_probe: int
) -> list[int]:
    """Nearest cells by squared L2 to the codebook — pure driver-side
    Python (the codebook is k×dims floats; no Spark job)."""
    dists = []
    for j, c in enumerate(centroids):
        acc = 0.0
        for x, y in zip(query_vec, c):
            d = float(x) - float(y)
            acc += d * d
        dists.append((acc, j))
    dists.sort()
    return [j for _, j in dists[:n_probe]]


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    query_vec: Sequence[float],
    topk: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact cosine top-k over the probed cells only.

    The ``cell IN (...)`` filter is a partition predicate on the
    layout written by :func:`write_ivf_index`, so the parquet scan
    touches n_probe/k of the files (PartitionFilters in the plan —
    pinned in tests/test_ivf_index.py)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.similarity import brute_force_topk

    cells = _probe_cells(query_vec, load_codebook(path), n_probe)
    scan = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    return brute_force_topk(
        scan,
        query_vec,
        k=topk,
        id_col=id_col,
        vec_col=vec_col,
        extra_cols=extra_cols,
    )


def append_to_ivf_index(
    vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally add vectors to an existing index — the
    production upsert path (a vector corpus grows continuously; the
    reference streams vector upserts to S3 Vectors the same way,
    S3VectorTargetMapper.java:87-177).

    New vectors are assigned to cells of the EXISTING codebook (one
    map-only scan against the broadcast centroids — centroids are not
    refit, the standard IVF practice until drift warrants a rebuild)
    and appended into their cell directories: untouched cells gain no
    files, probes keep pruning at the directory level, and readers
    see either the old or the extended listing — never a partial
    cell.  When append volume drifts the codebook stale or skews the
    cells, :func:`~sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance.rebalance_ivf_index`
    (r9) refits the quantizer on the indexed vectors and rewrites the
    cell layout in place (no source table needed) — pinned equivalent
    to a from-scratch ``write_ivf_index``, and it defragments the
    appended cell files in the same pass.
    """
    spark = vectors.sparkSession
    centroids = load_codebook(path, spark)
    labeled = kmeans_assign(
        vectors, centroids, id_col=id_col, vec_col=vec_col, cell_col="cell"
    )
    # match the standing layout (r8): an int8 index stores
    # (q_scale, q_code) alongside the raw vectors — appending raw-only
    # rows would give later probes a mixed-schema cell directory
    existing_cols = spark.read.parquet(path).columns
    if "q_code" in existing_cols:
        from sample_keyspaces_cdc_streams_connectors_spark.llm.quant import quantize_embeddings

        labeled = quantize_embeddings(labeled, vec_col=vec_col)
    # one file per touched cell per append (r9) — naive appends add
    # shuffle_partitions files per cell and probes drown in listings
    _cell_layout(labeled, len(centroids)).write.mode("append").partitionBy(
        "cell"
    ).parquet(path)


PQ_MODEL_FILE = "_pq_model.json"


def write_ivf_pq_index(
    vectors: DataFrame,
    path: str,
    k: int = 16,
    n_iter: int = 5,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF-PQ layout (the FAISS IVFPQ architecture, Jégou et al.
    TPAMI'11): cells partition the FILES, PQ codes compress the
    SCAN.  Each row stores its raw vector AND its m-byte code in the
    same cell-partitioned parquet — columnar storage makes that free:
    the ADC pass projects only ``(id, pq_code)`` (column pruning) over
    only the probed cells (partition pruning), and the raw vectors
    are fetched just for the re-ranked candidate ids.  Codes encode
    the RAW vectors, not residuals — simpler, and the exact re-rank
    step absorbs the recall difference (documented divergence from
    FAISS's residual default).

    Returns ``(centroids, PQModel)``; both persist alongside the data
    through the Hadoop FS (object-store safe)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pq import encode_pq, train_pq

    centroids = kmeans_fit(
        vectors, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    )
    model = train_pq(
        vectors, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col
    )
    labeled = kmeans_assign(
        vectors, centroids, id_col=id_col, vec_col=vec_col, cell_col="cell"
    )
    coded = encode_pq(labeled, model, vec_col=vec_col)
    _cell_layout(coded, k).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)
    spark = vectors.sparkSession
    _write_text(spark, _codebook_path(path), json.dumps(centroids))
    _write_text(
        spark,
        f"{path.rstrip('/')}/{PQ_MODEL_FILE}",
        json.dumps(
            {"dims": model.dims, "codebooks": model.codebooks.tolist()}
        ),
    )
    return centroids, model


def load_pq_model_json(path: str, spark: SparkSession | None = None):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pq import PQModel

    import numpy as np

    spark = spark or SparkSession.getActiveSession()
    raw = (
        _read_text(spark, f"{path.rstrip('/')}/{PQ_MODEL_FILE}")
        if spark is not None
        else open(f"{path.rstrip('/')}/{PQ_MODEL_FILE}", encoding="utf-8").read()
    )
    doc = json.loads(raw)
    return PQModel(
        codebooks=np.asarray(doc["codebooks"], dtype=np.float64),
        dims=int(doc["dims"]),
    )


def write_ivf_int8_index(
    vectors: DataFrame,
    path: str,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mode: str = "farthest",
) -> list[list[float]]:
    """IVF-int8 layout (r8): cells partition the FILES, symmetric
    int8 codes narrow the SCAN — the lossless-er middle rung of the
    compression ladder between float IVF (4 bytes/dim) and IVF-PQ
    (~m/d bytes/dim).  Each row stores its raw vector AND its
    ``(q_scale, q_code)`` quantization in the same cell-partitioned
    parquet; columnar storage makes the co-location free: the
    quantized scoring pass projects only ``(id, q_scale, q_code)``
    (column pruning, 1 byte/dim + 8) over only the probed cells
    (partition pruning), and raw vectors are fetched just for the
    re-ranked candidate ids — the same double-pruning shape as
    :func:`write_ivf_pq_index`, with NO second training pass (int8
    needs no codebooks).

    Returns the coarse codebook (persisted alongside, object-store
    safe)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.quant import quantize_embeddings

    centroids = kmeans_fit(
        vectors,
        k=k,
        n_iter=n_iter,
        id_col=id_col,
        vec_col=vec_col,
        seed_mode=seed_mode,
    )
    labeled = kmeans_assign(
        vectors, centroids, id_col=id_col, vec_col=vec_col, cell_col="cell"
    )
    coded = quantize_embeddings(labeled, vec_col=vec_col)
    _cell_layout(coded, k).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)
    _write_text(
        vectors.sparkSession, _codebook_path(path), json.dumps(centroids)
    )
    return centroids


def ivf_int8_topk(
    spark: SparkSession,
    path: str,
    query_vec: Sequence[float],
    topk: int = 10,
    n_probe: int = 2,
    rerank: bool = True,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Double-pruned int8 search over a :func:`write_ivf_int8_index`
    layout: partition pruning picks the probed cells, the quantized
    scoring pass scans only ``(id, q_scale, q_code)`` of those cells
    — 4× narrower than the float scan (both prunings pinned in
    tests/test_ivf_index.py) — and with ``rerank=True`` the exact
    cosine re-ranks the ``topk*rerank_factor`` int8 candidates
    against their raw vectors (a pushed-down id IN-filter over the
    probed cells only, never the whole table).  With the re-rank on,
    the answer equals float IVF at the same ``n_probe`` whenever the
    true in-probe top-k sits inside the int8 top-``k*factor`` —
    int8's ~1e-2 score error makes that hold except under
    adversarial ties (recall-parity pinned on the fixture)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.quant import quantized_topk

    cells = _probe_cells(query_vec, load_codebook(path, spark), n_probe)
    scan = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    quantized = scan.select(id_col, "q_scale", "q_code")
    if not rerank:
        return quantized_topk(quantized, query_vec, k=topk, id_col=id_col)
    return quantized_topk(
        quantized,
        query_vec,
        k=topk,
        id_col=id_col,
        rerank_with=scan.select(id_col, vec_col),
        vec_col=vec_col,
        rerank_factor=rerank_factor,
    )


def ivf_pq_topk(
    spark: SparkSession,
    path: str,
    query_vec: Sequence[float],
    topk: int = 10,
    n_probe: int = 2,
    refine: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-level pruned search over an IVF-PQ layout: partition
    pruning picks the probed cells, the ADC pass scans only
    ``(id, pq_code)`` of those cells (both prunings pinned in
    tests/test_ivf_index.py), and the final exact cosine re-ranks the
    ``topk*refine`` ADC candidates against their raw vectors."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pq import pq_topk
    from sample_keyspaces_cdc_streams_connectors_spark.llm.similarity import brute_force_topk

    model = load_pq_model_json(path, spark)
    cells = _probe_cells(query_vec, load_codebook(path, spark), n_probe)
    scan = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    cand_ids = pq_topk(
        scan.select(id_col, "pq_code"),
        model,
        query_vec,
        k=topk * refine,
        id_col=id_col,
    ).select(id_col)
    candidates = scan.join(cand_ids, id_col)
    return brute_force_topk(
        candidates, query_vec, k=topk, id_col=id_col, vec_col=vec_col
    )


def ivf_index_topk_many(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    topk: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    max_queries: int | None = 65_536,
) -> DataFrame:
    """BULK IVF search: every row of a query TABLE answered in ONE
    pruned pass over the index — the indexed mirror of
    :func:`~sample_keyspaces_cdc_streams_connectors_spark.llm.similarity.brute_force_topk_many`
    (and the dense mirror of ``bm25_topk_many``'s bucket-pruned bulk
    scan).

    Scale shape:

    - each query's probe cells come driver-side from the codebook (no
      Spark job), and the scan is pruned ONCE to the UNION of all
      probed cells — a query load that probes 5 of 1024 cells reads 5
      directories, and overlapping query workloads share the read;
    - the Arrow kernel scores each batch row only for the queries
      that probe its cell (per-cell query masks over the same one
      batch × queries matmul), emitting ≤ topk·n_q rows per batch;
    - one rank-over-window finalizes per query.

    Answers equal per-query :func:`ivf_index_topk` at the same
    ``n_probe`` (pinned).  Returns ``(query_id_col, id_col, sim,
    rank)`` — rrf_fuse/bm25-compatible.  ``max_queries`` (r10) makes
    the bounded-work-list contract executable — the driver-side
    collect fails fast past the bound instead of pulling a corpus
    (``None`` disables)."""
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

    from sample_keyspaces_cdc_streams_connectors_spark.llm.similarity import _collect_bounded_queries

    centroids = load_codebook(path, spark)
    qrows = _collect_bounded_queries(
        queries,
        [query_id_col, query_vec_col],
        max_queries,
        "ivf_index_topk_many",
    )
    qids = np.asarray([r[0] for r in qrows], dtype=np.int64)
    qmat = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qnorm[qnorm == 0.0] = 1.0
    qunit = qmat / qnorm[:, None]
    probe_sets = [
        frozenset(_probe_cells([float(x) for x in qmat[j]], centroids, n_probe))
        for j in range(len(qrows))
    ]
    union_cells = sorted(set().union(*probe_sets))
    # cell -> boolean query mask, shipped in the closure (k × n_q bits)
    cell_mask = {
        c: np.asarray([c in ps for ps in probe_sets], dtype=bool)
        for c in union_cells
    }

    scan = spark.read.parquet(path).filter(
        F.col("cell").isin(union_cells)
    )
    id_field = scan.schema[id_col]
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
            cells = pdf["cell"].to_numpy()
            v = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf[vec_col]]
            )
            norms = np.sqrt((v * v).sum(axis=1))
            norms[norms == 0.0] = 1.0
            sims = (v / norms[:, None]) @ qunit.T
            mask = np.stack(
                [cell_mask[int(c)] for c in cells]
            )  # (b × n_q) — row scored only for queries probing its cell
            sims = np.where(mask, sims, -np.inf)
            order = np.argsort(ids, kind="stable")
            sims_o = sims[order]
            ids_o = ids[order]
            kk = min(topk, len(ids))
            out_q: list = []
            out_i: list = []
            out_s: list = []
            for j in range(n_q):
                col = sims_o[:, j]
                top = np.argsort(-col, kind="stable")[:kk]
                top = top[np.isfinite(col[top])]
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

    candidates = scan.select(id_col, vec_col, "cell").mapInPandas(
        score, out_schema
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("sim"), F.asc(id_col)
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(query_id_col, id_col, "sim", "rank")
    )


def ivf_int8_topk_many(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    topk: int = 10,
    n_probe: int = 2,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    max_queries: int | None = 65_536,
) -> DataFrame:
    """BULK double-pruned int8 search over a
    :func:`write_ivf_int8_index` layout — the compression-ladder
    completion of :func:`ivf_index_topk_many`.

    Phase 1 (quantized candidates): the scan prunes ONCE to the union
    of every query's probe cells AND projects only
    ``(id, q_scale, q_code, cell)`` — partition pruning times the 4×
    narrower read, same as the single-query path.  The Arrow kernel
    scores each batch against ALL quantized queries as one exact
    int64 integer matmul, masks rows to the queries probing their
    cell, and emits per-batch ``topk·rerank_factor`` heaps; a rank
    window bounds the global candidate set per query.

    Phase 2 (exact re-rank): the candidate (query, id) pairs collect
    driver-side (≤ topk·factor·n_q rows — bounded), their RAW vectors
    scan once with a pushed-down id IN-filter over the probed cells
    only, and one Arrow pass re-scores each candidate row against
    exactly the queries that shortlisted it via the
    dimension-sequential cosine (bit-identical to the single-query
    re-rank).  Final rank window keeps ``topk`` per query.

    Answers equal per-query :func:`ivf_int8_topk` at the same
    ``n_probe``/``rerank_factor`` (pinned).  Returns
    ``(query_id_col, id_col, sim, rank)``.  ``max_queries`` (r10):
    executable work-list bound on the driver-side query collect
    (``None`` disables)."""
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

    from sample_keyspaces_cdc_streams_connectors_spark.llm.quant import _quantize_vec
    from sample_keyspaces_cdc_streams_connectors_spark.llm.similarity import (
        _collect_bounded_queries,
        _query_norm,
        _seq_cosine_block,
    )

    centroids = load_codebook(path, spark)
    qrows = _collect_bounded_queries(
        queries,
        [query_id_col, query_vec_col],
        max_queries,
        "ivf_int8_topk_many",
    )
    qids = np.asarray([r[0] for r in qrows], dtype=np.int64)
    qmat = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    qnorms = np.asarray(
        [_query_norm(list(r[1])) for r in qrows], dtype=np.float64
    )
    qscales = np.zeros(len(qrows))
    qcodes = np.zeros((len(qrows), qmat.shape[1]), dtype=np.int64)
    for j in range(len(qrows)):
        s, c = _quantize_vec(qmat[j])
        qscales[j] = s
        qcodes[j] = c.astype(np.int64)
    probe_sets = [
        frozenset(
            _probe_cells([float(x) for x in qmat[j]], centroids, n_probe)
        )
        for j in range(len(qrows))
    ]
    union_cells = sorted(set().union(*probe_sets))
    cell_mask = {
        c: np.asarray([c in ps for ps in probe_sets], dtype=bool)
        for c in union_cells
    }

    scan = spark.read.parquet(path).filter(F.col("cell").isin(union_cells))
    id_field = scan.schema[id_col]
    cand_schema = StructType(
        [
            StructField(query_id_col, LongType(), False),
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("approx", DoubleType(), True),
        ]
    )
    n_cand = topk * rerank_factor

    def approx_score(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        n_q = qcodes.shape[0]
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy()
            scales = pdf["q_scale"].to_numpy(dtype=np.float64)
            # q_code is BinaryType: 1 byte/dim two's-complement int8
            codes = np.asarray(
                [
                    np.frombuffer(c, dtype=np.int8).astype(np.int64)
                    for c in pdf["q_code"]
                ]
            )
            dots = codes @ qcodes.T  # exact in int64
            sims = (
                dots.astype(np.float64) * scales[:, None]
            ) * qscales[None, :]
            mask = np.stack([cell_mask[int(c)] for c in cells])
            sims = np.where(mask, sims, -np.inf)
            order = np.argsort(ids, kind="stable")
            sims_o = sims[order]
            ids_o = ids[order]
            kk = min(n_cand, len(ids))
            out_q: list = []
            out_i: list = []
            out_s: list = []
            for j in range(n_q):
                col = sims_o[:, j]
                top = np.argsort(-col, kind="stable")[:kk]
                top = top[np.isfinite(col[top])]
                out_q.extend([qids[j]] * len(top))
                out_i.extend(ids_o[top])
                out_s.extend(col[top])
            yield pd.DataFrame(
                {
                    query_id_col: pd.Series(out_q, dtype="int64"),
                    id_col: out_i,
                    "approx": pd.Series(out_s, dtype="float64"),
                }
            )

    w_cand = Window.partitionBy(query_id_col).orderBy(
        F.desc("approx"), F.asc(id_col)
    )
    cand = (
        scan.select(id_col, "q_scale", "q_code", "cell")
        .mapInPandas(approx_score, cand_schema)
        .withColumn("__rn", F.row_number().over(w_cand))
        .filter(F.col("__rn") <= n_cand)
        .select(query_id_col, id_col)
        .collect()
    )
    want: dict = {}
    for r in cand:
        want.setdefault(r[id_col], set()).add(int(r[query_id_col]))
    qpos = {int(q): j for j, q in enumerate(qids)}
    want_mask = {
        vid: np.asarray(
            [j in {qpos[q] for q in qs} for j in range(len(qids))],
            dtype=bool,
        )
        for vid, qs in want.items()
    }
    cand_ids = sorted(want)

    rerank_schema = StructType(
        [
            StructField(query_id_col, LongType(), False),
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("sim", DoubleType(), True),
        ]
    )

    def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            v = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf[vec_col]]
            )
            sims = _seq_cosine_block(v, qmat, qnorms)
            out_q: list = []
            out_i: list = []
            out_s: list = []
            for i, vid in enumerate(ids):
                m = want_mask[vid]
                for j in np.nonzero(m)[0]:
                    out_q.append(qids[j])
                    out_i.append(vid)
                    out_s.append(sims[i, j])
            yield pd.DataFrame(
                {
                    query_id_col: pd.Series(out_q, dtype="int64"),
                    id_col: out_i,
                    "sim": pd.Series(out_s, dtype="float64"),
                }
            )

    raw = (
        scan.select(id_col, vec_col)
        .filter(F.col(id_col).isin(cand_ids))
        .mapInPandas(rerank, rerank_schema)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("sim"), F.asc(id_col)
    )
    return (
        raw.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(query_id_col, id_col, "sim", "rank")
    )
