"""Semantic deduplication — SemDeDup (Abbas et al., 2023).

Near-dup detection in *embedding* space: k-means partitions the
corpus into semantic clusters, and within each cluster any document
whose cosine similarity to an already-kept document exceeds ``eps``
is a semantic duplicate.  This catches paraphrases and re-renderings
that lexical dedup (MinHash / n-gram Jaccard over shingles) misses,
at the cost of only ever comparing documents that share a cluster —
the paper's own scoping approximation, which is what makes the
operation tractable at corpus scale.

Reference tie-in: the reference generates embeddings and delegates
ALL vector math to a remote store (S3VectorTargetMapper.java:87-177);
a native engine owns the embedding-space curation step itself.

Algorithm (the published construction):
1. cluster embeddings with k-means (``llm.kmeans`` — deterministic
   farthest-point seeding, no RNG);
2. within each cluster, order items by similarity to the centroid
   ASCENDING (farthest first; id ascending on ties);
3. item ``j`` is a duplicate iff ``max_{i<j} cos(x_i, x_j) > eps`` —
   the first-processed member of every duplicate chain survives, so
   the survivor is the member FARTHEST from the centroid (the paper
   measured "keep low-similarity examples" as the best-performing
   keep rule; r5 review fixed an inverted sort that kept the
   closest member instead).

Scale design:
- Cluster assignment is a MAP-ONLY Arrow pass: the k×dims codebook
  ships as a broadcast numpy matrix and each batch is normalized +
  argmin'd vectorized; nothing shuffles.  (An earlier spelling folded
  the codebook into the plan as a literal expression matrix — correct,
  but Catalyst analysis cost grows with k·dims per action, ~10 s at
  k=8/d=64, and the paper's own sizing rule k ≈ n_docs/5000 means a
  100 TB corpus wants *tens of thousands* of centroids, far past what
  a literal plan can encode.  A broadcast ndarray is O(k·d) bytes once
  per executor and the batch math is one blocked matmul-shaped sweep.)
- The only exchange moves (id, cell, centroid_sim, unit-vector) into
  per-cluster groups for one Arrow ``applyInPandas`` pass.  Text
  never shuffles — survivors come back as an id-join.
- Within a group the pairwise max is computed BLOCKWISE (B×n matmul
  slabs, O(B·n) memory), so a group costs O(n²d/B) flops vectorized
  but never materializes the n×n similarity matrix.
- Skew guard: cluster sizes are counted first (ONE k-row aggregate —
  codebook-sized collect); clusters above ``max_cluster_size`` are
  deterministically split into ``ceil(n/max)`` sub-groups by
  ``xxhash64(id)``.  Pairs across sub-groups are then not compared —
  a documented recall trade on pathological clusters, bounding
  worst-case group memory regardless of how skewed the clustering
  comes out.  At 100 TB pick ``k ~ n_docs/5000`` so the EXPECTED
  cluster is small and the splitter almost never fires.
- Determinism: the group pass re-sorts rows internally, numpy's
  float64 matmul is deterministic for a fixed row order, and the
  keep rule has a total order — results are partitioning-invariant
  (property-tested).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from sample_keyspaces_cdc_streams_connectors_spark.llm.kmeans import kmeans_fit


#: scoped persist of the assignment pass (see semantic_dedup_annotate)
_SEM_CACHE: list[DataFrame] = []


def release_semdedup_cache() -> None:
    """Unpersist assignment frames cached by the previous annotate
    call (same scoping discipline as ``llm.dedup.release_ngram_cache``
    — a call's result has been consumed by the time the next one is
    built)."""
    while _SEM_CACHE:
        df = _SEM_CACHE.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass


def _unit(centroid: list[float]) -> list[float]:
    n = math.sqrt(sum(float(x) * float(x) for x in centroid))
    if n <= 0.0:
        return [0.0 for _ in centroid]
    return [float(x) / n for x in centroid]


def _assign_cells(
    vectors: DataFrame,
    unit_cents: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """MAP-ONLY cluster assignment: one Arrow pass computes the unit
    vector, the cell AND the centroid similarity (for unit vectors
    |x - c|² = 2 - 2·cos, so the argmin's distance doubles as the
    similarity).  The codebook is a broadcast ndarray (scales to the
    k ~ n/5000 regime where a literal expression matrix cannot);
    distances are exact elementwise (nx − c)² sums — the same
    arithmetic as the sequential reference and the SQL oracle, which
    matters because the keep order sorts on these values — tiled over
    (row_block × cent_block) so the broadcast difference tensor stays
    bounded however large the batch, k, or dims grow.  Ties keep the
    lowest centroid index (within-tile argmin + strict-< across
    tiles).  Stream-safe: stateless, works on readStream frames.
    Returns ``(id_col, __nv, cell, centroid_sim, *carry_cols)`` —
    ``carry_cols`` (r10) ride through the Arrow pass verbatim, so a
    caller that must keep payload columns under the new cell (the
    maintenance relabel) needs no id re-join, which would
    cross-multiply duplicate member ids."""
    sc = vectors.sparkSession.sparkContext
    bc_cents = sc.broadcast(np.asarray(unit_cents, dtype=np.float64))
    id_field = vectors.schema[id_col]
    assign_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("__nv", ArrayType(DoubleType(), False), False),
            StructField("cell", IntegerType(), False),
            StructField("centroid_sim", DoubleType(), False),
        ]
        + [vectors.schema[c] for c in carry_cols]
    )

    def assign_batches(batches):
        C = bc_cents.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(X, axis=1)
            nz = norms > 0.0
            # zero-norm rows stay all-zero (cos := 0)
            NX = np.where(
                nz[:, None], X / np.where(nz, norms, 1.0)[:, None], 0.0
            )
            n = len(NX)
            # exact elementwise (nx − c)² distances, TILED over both
            # rows and centroid blocks so the broadcast difference
            # tensor is bounded at row_block·cent_block·dims doubles
            # regardless of batch size, k, or dims (r5 review finding:
            # the untiled spelling materialized batch·block·dims and
            # OOMed at the k ~ n/5000 / dims ≥ 512 regime).  The
            # arithmetic is kept IDENTICAL to the sequential reference
            # and the SQL oracle — a ‖x‖²+‖c‖²−2·x·c matmul would be
            # cheaper but orders near-tied centroid sims differently
            # (bit-level), and the keep order sorts on these values.
            dims = max(1, C.shape[1])
            cent_block = max(1, (1 << 16) // dims)
            row_block = max(1, (1 << 22) // (cent_block * dims))
            best_d = np.full(n, np.inf)
            best_j = np.zeros(n, dtype=np.int64)
            for rs in range(0, n, row_block):
                re_ = min(rs + row_block, n)
                NXb = NX[rs:re_]
                for cs in range(0, len(C), cent_block):
                    blk = C[cs : cs + cent_block]
                    d2 = ((NXb[:, None, :] - blk[None, :, :]) ** 2).sum(
                        axis=2
                    )
                    jloc = np.argmin(d2, axis=1)
                    dloc = d2[np.arange(re_ - rs), jloc]
                    upd = dloc < best_d[rs:re_]
                    best_j[rs:re_][upd] = jloc[upd] + cs
                    best_d[rs:re_][upd] = dloc[upd]
            sim = np.where(nz, 1.0 - best_d / 2.0, 0.0)
            out = {
                id_col: pdf[id_col],
                "__nv": list(NX),
                "cell": best_j.astype("int32"),
                "centroid_sim": sim,
            }
            for c in carry_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return vectors.select(id_col, vec_col, *carry_cols).mapInPandas(
        assign_batches, assign_schema
    )


def semantic_dedup_annotate(
    vectors: DataFrame,
    centroids: list[list[float]] | None = None,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = 8192,
    block_rows: int = 1024,
    seed_mode: str = "farthest",
) -> DataFrame:
    """Per-document SemDeDup annotation.

    Returns ``(id_col, cell, centroid_sim, max_prior_sim)`` — one row
    per input document.  ``max_prior_sim`` is the maximum cosine
    similarity to any cluster-mate ranked EARLIER in the keep order —
    farther from the centroid, id ascending on ties (-1.0, the cosine
    floor, for each cluster's representative — the max over an empty
    prior set); a document is a semantic duplicate at threshold
    ``eps`` iff ``max_prior_sim > eps``, so each duplicate chain's
    survivor is its lowest-centroid-similarity member (the paper's
    keep rule).  Training runs here unless a codebook is passed in
    (reuse one codebook across corpus snapshots to keep cluster ids
    stable).

    ``max_cluster_size=None`` (r14) disables the oversized-cluster
    splitter OUTRIGHT: no skew-guard count job at construction, no
    assignment persist — identical output to any bound no cell
    reaches (pinned in tests/test_semdedup.py); use it when exact
    whole-cluster semantics are required or cluster sizes are known
    bounded.
    """
    if centroids is None:
        centroids = kmeans_fit(
            vectors,
            k=k,
            n_iter=n_iter,
            id_col=id_col,
            vec_col=vec_col,
            seed_mode=seed_mode,
        )
    unit_cents = [_unit(c) for c in centroids]
    release_semdedup_cache()
    if max_cluster_size is None:
        # r14: splitter explicitly disabled — skip the skew-guard
        # count (which forced the whole-corpus normalize+argmin Arrow
        # sweep at CONSTRUCTION time) and the persist (which existed
        # only because guard + scoring both consumed the assignment).
        # One straight pipeline: scan → assign → group-score.  The
        # oracle gate uses this (exact per-cluster semantics need the
        # splitter off anyway); semantics are identical to a bound no
        # cell reaches — every n_subs is 1 either way.
        assigned = _assign_cells(
            vectors, unit_cents, id_col=id_col, vec_col=vec_col
        )
        grouped = assigned.withColumn("__sub", F.lit(0))
        return _score_grouped(
            grouped, vectors, id_col, block_rows
        )
    # persist the assignment: the skew-guard count below and the
    # scoring groupBy both consume it, and without the cache the
    # whole-corpus normalize+argmin Arrow sweep would run TWICE
    # (r5 review finding).  Scoped like llm.dedup's ngram cache —
    # released on the next annotate call / by the registry wrapper.
    assigned = _assign_cells(
        vectors, unit_cents, id_col=id_col, vec_col=vec_col
    ).persist()
    _SEM_CACHE.append(assigned)

    # skew guard: k-row aggregate -> sub-group fan-out per oversized
    # cell (collect is codebook-sized by construction)
    counts = {
        r["cell"]: r["n"]
        for r in assigned.groupBy("cell")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_subs = [
        max(1, math.ceil(counts.get(j, 0) / max_cluster_size))
        for j in range(len(unit_cents))
    ]
    if max(n_subs) == 1:
        # common case: no oversized cluster — no split machinery in
        # the plan at all (a k-element literal array here would
        # reintroduce the O(k) Catalyst analysis cost the broadcast
        # codebook exists to avoid; r5 review finding)
        grouped = assigned.withColumn("__sub", F.lit(0))
    else:
        subs_df = vectors.sparkSession.createDataFrame(
            [(j, int(s)) for j, s in enumerate(n_subs)],
            "cell int, __n_subs int",
        )
        grouped = (
            assigned.join(F.broadcast(subs_df), "cell")
            .withColumn(
                "__sub",
                F.pmod(
                    F.xxhash64(F.col(id_col).cast("string")),
                    F.col("__n_subs"),
                ).cast("int"),
            )
            .drop("__n_subs")
        )

    return _score_grouped(grouped, vectors, id_col, block_rows)


def _score_grouped(
    grouped: DataFrame,
    vectors: DataFrame,
    id_col: str,
    block_rows: int,
) -> DataFrame:
    """The per-(cell, __sub) ranked pairwise-max scoring pass shared
    by both annotate paths (splitter on/off)."""
    id_field = vectors.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("cell", IntegerType(), False),
            StructField("centroid_sim", DoubleType(), False),
            StructField("max_prior_sim", DoubleType(), False),
        ]
    )

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic processing order: FARTHEST-from-centroid
        # first, so each duplicate chain's survivor is its
        # lowest-centroid-similarity member — the paper's measured
        # keep rule (r5 review fixed the inverted descending sort)
        pdf = pdf.sort_values(
            ["centroid_sim", id_col], ascending=[True, True]
        ).reset_index(drop=True)
        n = len(pdf)
        X = np.stack(pdf["__nv"].to_numpy()).astype(np.float64)
        # m[j] = max_{i<j} X[i]·X[j]; the max over an EMPTY prior set
        # is the cosine floor -1.0 (not 0.0), so each cluster's
        # representative survives ANY threshold — eps below -1 cannot
        # empty a cluster
        m = np.full(n, -1.0, dtype=np.float64)
        # blockwise upper-triangle max
        for start in range(0, n, block_rows):
            end = min(start + block_rows, n)
            S = X[start:end] @ X.T  # (block, n) slab
            for i in range(start, end):
                if i + 1 < n:
                    np.maximum(m[i + 1 :], S[i - start, i + 1 :], out=m[i + 1 :])
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "cell": pdf["cell"].astype("int32"),
                "centroid_sim": pdf["centroid_sim"],
                "max_prior_sim": m,
            }
        )

    return grouped.groupBy("cell", "__sub").applyInPandas(
        score_group, out_schema
    )


def semantic_dedup(
    vectors: DataFrame,
    eps: float = 0.95,
    centroids: list[list[float]] | None = None,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = 8192,
    seed_mode: str = "farthest",
) -> DataFrame:
    """Survivor rows of ``vectors`` after SemDeDup at threshold
    ``eps`` (original columns preserved; duplicates removed).

    Only ids travel back from the annotation — the payload columns
    rejoin on ``id_col``, so wide rows (text, raw vectors) never
    shuffle through the scoring pass.
    """
    keep = (
        semantic_dedup_annotate(
            vectors,
            centroids=centroids,
            k=k,
            n_iter=n_iter,
            id_col=id_col,
            vec_col=vec_col,
            max_cluster_size=max_cluster_size,
            seed_mode=seed_mode,
        )
        .filter(F.col("max_prior_sim") <= F.lit(float(eps)))
        .select(id_col)
    )
    return vectors.join(keep, id_col, "inner")


# --- persisted semantic index (cross-corpus / streaming SemDeDup) ----------

#: index layout: ``<path>/members`` parquet partitioned by ``cell``
#: with (id, nv unit-vector) rows, plus the shared ``_codebook.json``
MEMBERS_DIR = "members"


def _int8_member_cols(nv: F.Column) -> tuple[F.Column, F.Column]:
    """Pure-JVM symmetric int8 quantization of a unit vector column:
    ``(scale, code array<tinyint>)`` with scale = max|v|/127 and
    half-away-from-zero rounding (Spark ROUND = HALF_UP = away from
    zero on both signs).  Array-of-tinyint (not binary) so the PROBE
    dot stays a whole-stage-codegen ``zip_with`` — no Python, no
    byte-unpacking UDF."""
    m = F.array_max(F.transform(nv, lambda x: F.abs(x)))
    scale = F.when(m > 0.0, m / F.lit(127.0)).otherwise(F.lit(0.0))
    code = F.when(
        m > 0.0,
        F.transform(
            nv,
            lambda x: F.greatest(
                F.least(F.round(x / (m / F.lit(127.0)), 0), F.lit(127.0)),
                F.lit(-127.0),
            ).cast("tinyint"),
        ),
    ).otherwise(F.transform(nv, lambda x: F.lit(0).cast("tinyint")))
    return scale, code


def write_semantic_index(
    vectors: DataFrame,
    path: str,
    centroids: list[list[float]] | None = None,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mode: str = "farthest",
    int8: bool = False,
    files_per_cell: int = 1,
) -> list[list[float]]:
    """Persist a STANDING semantic-dedup index: the kept corpus's
    unit vectors, cell-partitioned under the k-means codebook (same
    ``_codebook.json`` convention as the IVF index, so one trained
    quantizer can back both the ANN search and the dedup gate).

    Incoming batches then probe it with
    :func:`semantic_dedup_against_index` — the cross-corpus /
    streaming analog of :func:`semantic_dedup`, completing the
    dedup-ladder × streaming matrix (exact and lexical-near streaming
    suppression live in ``llm.dedup_index``; this is the
    paraphrase-level counterpart).  Returns the codebook.

    ``int8=True`` (r8) stores members as ``(scale, code)`` symmetric
    int8 quantizations instead of float unit vectors — ~4× narrower
    probe scans at a ≤ ~1e-2 cosine error (the probe's suppression
    threshold becomes approximate by that margin; fine for a dedup
    gate, wrong for an exact-scoring consumer).  The probe
    auto-detects the layout from the member schema — same config
    key, same call sites.

    Layout (r10): members route through the same cell-keyed layout
    shuffle as the IVF index (``ivf_index._cell_layout``) before
    ``partitionBy`` — ``_assign_cells`` is map-only, so a direct
    write would emit up to ``shuffle_partitions`` files per touched
    cell (the exact probe-degrading fragmentation the r9 stress
    measured for text postings, 0.71→4.74 s).  ``files_per_cell``
    bounds files per cell per write; salting uses the id column."""
    import json

    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (
        _cell_layout,
        _codebook_path,
        _write_text,
    )

    if centroids is None:
        centroids = kmeans_fit(
            vectors,
            k=k,
            n_iter=n_iter,
            id_col=id_col,
            vec_col=vec_col,
            seed_mode=seed_mode,
        )
    unit_cents = [_unit(c) for c in centroids]
    assigned = _assign_cells(
        vectors, unit_cents, id_col=id_col, vec_col=vec_col
    )
    if int8:
        scale, code = _int8_member_cols(F.col("__nv"))
        members = assigned.select(
            id_col, scale.alias("q_scale"), code.alias("q_code"), "cell"
        )
    else:
        members = assigned.select(id_col, F.col("__nv").alias("nv"), "cell")
    (
        _cell_layout(members, len(unit_cents), files_per_cell)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path.rstrip('/')}/{MEMBERS_DIR}")
    )
    _write_text(
        vectors.sparkSession, _codebook_path(path), json.dumps(centroids)
    )
    return centroids


def semantic_dedup_against_index(
    batch: DataFrame,
    path: str,
    eps: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Rows of ``batch`` with NO semantic duplicate (cosine > ``eps``)
    in the standing index at ``path`` — original columns preserved.

    Stream-safe by construction (the streaming-ingest scale path):

    - batch vectors assign to cells MAP-ONLY against the broadcast
      codebook (:func:`_assign_cells` — stateless Arrow pass);
    - suppression is ONE stream-static LEFT ANTI join whose equi-key
      is the cell and whose residual is the exact unit-dot
      ``cos > eps`` — only same-cell (member, batch-row) pairs are
      ever compared, the SemDeDup scoping approximation applied
      cross-corpus.  At scale the join shuffles by ``cell``: pair
      work is bounded by cluster sizes, never |index|×|batch|;
    - survivors rejoin the full batch rows by id, so payload columns
      never enter the vector comparison.

    False positives cannot exist against a FLOAT index (the dot is
    exact); a batch row identical to an index member scores cos = 1
    and is suppressed.  Against an ``int8=True`` index (auto-detected
    from the member schema, r8) the member side is dequantized inside
    the join residual — ``scale · Σ nv_i·code_i``, still a pure-JVM
    ``zip_with`` over a ~4× narrower scan — and the threshold is
    approximate by the quantization's ≤ ~1e-2 cosine error.
    Within-batch duplicates are NOT compared here — compose with
    :func:`semantic_dedup` per micro-batch (or accept first-writer
    semantics after the survivors are appended to the index)."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import load_codebook

    spark = batch.sparkSession
    centroids = load_codebook(path, spark)
    unit_cents = [_unit(c) for c in centroids]
    assigned = _assign_cells(batch, unit_cents, id_col=id_col, vec_col=vec_col)
    members_raw = spark.read.parquet(f"{path.rstrip('/')}/{MEMBERS_DIR}")
    if "q_code" in members_raw.columns:
        members = members_raw.select(
            F.col("cell").alias("__mcell"),
            F.col("q_scale").alias("__mscale"),
            F.col("q_code").alias("__mcode"),
        )
        dot = F.col("__mscale") * F.aggregate(
            F.zip_with(
                "__nv", "__mcode", lambda a, b: a * b.cast("double")
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    else:
        members = members_raw.select(
            F.col("cell").alias("__mcell"), F.col("nv").alias("__mnv")
        )
        dot = F.aggregate(
            F.zip_with("__nv", "__mnv", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    fresh = assigned.join(
        members,
        (F.col("cell") == F.col("__mcell")) & (dot > F.lit(float(eps))),
        "left_anti",
    ).select(id_col)
    return batch.join(fresh, id_col, "inner")


def append_to_semantic_index(
    vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    files_per_cell: int = 1,
) -> None:
    """Incrementally add vectors to an existing semantic index — the
    streaming-ingest loop's second half (probe with
    :func:`semantic_dedup_against_index`, append the survivors so the
    NEXT batch dedups against them too).

    New unit vectors assign to cells of the EXISTING codebook (one
    map-only broadcast-codebook scan — centroids are not refit, same
    practice as ``append_to_ivf_index``) and append into their cell
    directories: untouched cells gain no files, and readers see
    either the old or the extended listing — never a partial cell.
    Periodic re-fit + rewrite (:func:`write_semantic_index`) is the
    compaction story.

    Caveat (standard Spark file-source append semantics): a QUERY
    built before the append keeps its pre-append file listing, and a
    new probe must not be derived lazily from such a query — Spark
    canonicalizes two scans of the same path as one relation and may
    reuse the stale broadcast.  The streaming-ingest loop naturally
    avoids this: each micro-batch's survivors are materialized (sunk)
    before the append, and the next batch builds fresh plans.

    Layout (r10): like the full write, appends route through the
    cell-keyed ``_cell_layout`` shuffle so each append adds at most
    ``files_per_cell`` files per TOUCHED cell — not
    ``shuffle_partitions`` files per cell, the fragmentation mode
    that degrades standing-index probes under sustained ingest."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import _cell_layout, load_codebook

    spark = vectors.sparkSession
    centroids = load_codebook(path, spark)
    unit_cents = [_unit(c) for c in centroids]
    assigned = _assign_cells(
        vectors, unit_cents, id_col=id_col, vec_col=vec_col
    )
    # match the standing layout (float nv vs int8 scale/code, r8) —
    # a mixed-schema cell directory would break every later probe
    existing = spark.read.parquet(f"{path.rstrip('/')}/{MEMBERS_DIR}")
    if "q_code" in existing.columns:
        scale, code = _int8_member_cols(F.col("__nv"))
        members = assigned.select(
            id_col, scale.alias("q_scale"), code.alias("q_code"), "cell"
        )
    else:
        members = assigned.select(id_col, F.col("__nv").alias("nv"), "cell")
    (
        _cell_layout(members, len(unit_cents), files_per_cell)
        .write.mode("append")
        .partitionBy("cell")
        .parquet(f"{path.rstrip('/')}/{MEMBERS_DIR}")
    )
