"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard.

All hash math uses md5-derived 60-bit integers
(``conv(substr(md5(x),1,15),16,10)``) so every stage is deterministic
AND replicable in ANSI SQL by the DuckDB oracle — no engine-private
hash functions in the semantics.

Scale design (100 TB):
- exact dedup: one hash-shuffle on the fingerprint;
- MinHash: shingles are exploded once, hashed for all permutations
  via a posexplode over seeds, min-aggregated per (doc, seed) — a
  single shuffle keyed by doc; the LSH band join shuffles only
  (band, signature) keys, never full texts;
- candidate verification joins shingle sets only for candidate
  pairs (the classic LSH pruning — pair count is ~linear, not
  quadratic);
- SimHash: one pass, bit-majority via array aggregate — no joins.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.functions.text import (
    doc_fingerprint,
    normalize_text,
    shingles_from_tokens,
    tokens,
)

NUM_HASHES = 16
BAND_ROWS = 4  # 4 bands × 4 rows


def md5_int(col: Column) -> Column:
    """md5 → 60-bit non-negative bigint (engine-portable hash)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents.

    Returns fingerprint, n_docs, min doc_id (canonical survivor) for
    groups with >1 member — the standard keep-one exact-dedup plan.
    """
    return (
        docs.select(
            F.col("doc_id"), doc_fingerprint(F.col(text_col)).alias("fp")
        )
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _doc_shingles(docs: DataFrame, text_col: str, k: int) -> DataFrame:
    """(doc_id, shingle) distinct pairs; ``shingle`` is the 60-bit
    md5 hash of the k-word shingle, not the string — int64 keys make
    every downstream join/groupBy shuffle smaller (collision odds
    ~n²/2^61, and the SQL oracle hashes identically).

    Two-phase: tokenize in one projection, shingle from the bound
    array column in the next — keeps the regexp tokenizer evaluated
    once per document instead of once per shingle index (see
    ``shingles_from_tokens`` PERF note; 10× at sf0.1)."""
    with_toks = docs.select(
        "doc_id", tokens(normalize_text(F.col(text_col))).alias("__toks")
    )
    return with_toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(shingles_from_tokens(F.col("__toks"), k), md5_int)
            )
        ).alias("shingle"),
    )


#: Mersenne prime 2^31-1 for the affine permutation family
_MERSENNE = (1 << 31) - 1
#: fixed odd multipliers/offsets (derived once from the golden ratio;
#: any fixed coprime-ish constants work — deterministic, documented)
_PERM_A = [2 * i * 2654435761 % _MERSENNE + 1 for i in range(64)]
_PERM_B = [(i * 40503 * 65537 + 1) % _MERSENNE for i in range(64)]


def minhash_signatures(
    shingles: DataFrame,
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """Wide MinHash signature: (doc_id, m0..m{n-1}) from a
    (doc_id, shingle) frame, via the affine permutation family
    h_j(s) = (a_j * h30(s) + b_j) mod (2^31-1).

    The base hash (one md5 per shingle, already materialized by
    ``_doc_shingles``) reduces mod 2^31-1 once; each permutation is
    an integer multiply-add inside whole-stage codegen, and all n
    mins are computed in ONE groupBy (map-side partial min per
    column — no 16× row explosion, a single shuffle of partial
    states).  Arithmetic stays below 2^62 → exact in int64 and
    exactly replicable in SQL."""
    base = shingles.withColumn("h30", F.col("shingle") % _MERSENNE)
    return base.groupBy("doc_id").agg(
        *[
            F.min((F.lit(_PERM_A[j]) * F.col("h30") + _PERM_B[j]) % _MERSENNE)
            .alias(f"m{j}")
            for j in range(num_hashes)
        ]
    )


def _band_signatures(
    sigs: DataFrame,
    num_hashes: int = NUM_HASHES,
    band_rows: int = BAND_ROWS,
) -> DataFrame:
    """(doc_id, band, band_sig): md5 over each band's minhash block."""
    n_bands = num_hashes // band_rows
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"m{b * band_rows + r}").cast("string")
                            for r in range(band_rows)
                        ],
                    )
                ).alias("band_sig"),
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select(
        "doc_id", F.explode(bands).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))


def minhash_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = NUM_HASHES,
    band_rows: int = BAND_ROWS,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, verified with exact Jaccard.

    Pipeline: shingle → minhash → band → bucket self-join (candidates)
    → exact Jaccard on candidate pairs only → threshold.  Returns
    (doc_a, doc_b, jaccard) with doc_a < doc_b.

    The shingle frame is deliberately NOT cached although four
    branches consume it: materializing the cache blocks pipelining
    and costs more than recomputing the (cheap, scan-parallel)
    shingling — measured 4.8s cached vs 1.7s uncached at sf0.1.

    r14 optimization — construction only: the pipeline is composed as
    SQL text (the Column-tree form cost ~0.7 s of py4j round trips
    per invocation); the PHYSICAL plan is unchanged.  Two rewrites of
    the plan itself were tried, measured SLOWER at sf0.1, and kept
    out: (a) array-fold signatures (the streaming
    :func:`with_minhash_signature` shape — removes the signature
    Exchange but evaluates 16 interpreted HOF folds per doc vs the
    exploded form's codegen multiply-adds: 3.5× slower); (b)
    ``array_intersect`` verification over per-doc shingle arrays (the
    prefix-mode ngram shape — fewer shuffles but an extra
    InferFiltersFromGenerate re-evaluation hazard and interpreted
    intersects: ~1.7× slower end-to-end).
    """
    from sample_keyspaces_cdc_streams_connectors_spark.functions.text import (
        md5_int_sql,
        normalize_text_sql,
        shingles_from_tokens_sql,
        tokens_sql,
    )

    n_bands = num_hashes // band_rows
    # NOTE the explode stays INLINE over the shingle expression (the
    # pre-r14 plan shape): an `explode(attr)` over a separate array
    # projection makes InferFiltersFromGenerate add a size()>0 filter
    # that predicate-pushdown then inlines BELOW the projection,
    # re-evaluating the whole tokenize+shingle pipeline per row —
    # measured 2× execution time at sf0.1 when tried.
    sh = docs.selectExpr(
        "doc_id", f"{tokens_sql(normalize_text_sql(text_col))} AS __toks"
    ).selectExpr(
        "doc_id",
        "explode(array_distinct(transform("
        f"{shingles_from_tokens_sql('__toks', k)}, "
        f"x -> {md5_int_sql('x')}))) AS shingle",
    )
    base = sh.selectExpr("doc_id", f"shingle % {_MERSENNE}L AS h30")
    sigs = base.groupBy("doc_id").agg(
        *[
            F.expr(
                f"min(({_PERM_A[j]}L * h30 + {_PERM_B[j]}L) % {_MERSENNE}L)"
            ).alias(f"m{j}")
            for j in range(num_hashes)
        ]
    )
    band_structs = ", ".join(
        f"struct({b} AS band, md5(concat_ws(',', "
        + ", ".join(
            f"CAST(m{b * band_rows + r} AS STRING)"
            for r in range(band_rows)
        )
        + ")) AS band_sig)"
        for b in range(n_bands)
    )
    bands = sigs.selectExpr(
        "doc_id", f"explode(array({band_structs})) AS bs"
    ).selectExpr("doc_id", "bs.band AS band", "bs.band_sig AS band_sig")

    left = bands.alias("l")
    right = bands.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_sig") == F.col("r.band_sig"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )

    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    common = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "n", "n_a"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n", "n_b"
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select(
            "doc_a",
            "doc_b",
            # round through DECIMAL for cross-engine determinism, emit
            # DOUBLE (DECIMAL output types hash-diverge in the gate)
            F.col("jaccard")
            .cast("decimal(18,6)")
            .cast("double")
            .alias("jaccard"),
        )
    )


# Scoped cache for ngram_jaccard_pairs' hashed-shingle arrays: the
# persist is load-bearing (four consumers of one expensive projection)
# but the function returns a LAZY plan, so the cache must outlive the
# call.  To keep long-lived sessions from accreting one cached frame
# per invocation, each call releases the previous call's cache and
# registers its own; `release_ngram_cache()` frees the last one.
_NGRAM_CACHE: list[DataFrame] = []


def release_ngram_cache() -> None:
    """Unpersist the hashed-shingle cache of the most recent
    :func:`ngram_jaccard_pairs` invocation (no-op when none).  Called
    automatically by the next invocation and by the query registry
    between gate queries; library callers holding the returned frame
    past that point simply recompute."""
    while _NGRAM_CACHE:
        _NGRAM_CACHE.pop().unpersist()


#: auto prefix-filter threshold: above this estimated input size the
#: candidate-pair shuffle dominates the query and SSJoin prefix
#: filtering (~3x candidate cut measured) is strictly right; below
#: it the two extra stages are a wash.  Env-overridable.
NGRAM_PREFIX_AUTO_BYTES = int(
    os.environ.get("SPARK_GRAFT_NGRAM_PREFIX_BYTES", str(1 << 30))
)


class NgramCandidateBudgetError(ValueError):
    """The posting-list candidate estimate Σ C(df, 2) exceeds the
    caller's ``candidate_budget`` — the corpus is too duplicated for
    direct n-gram candidate generation.  Run exact dedup first
    (:func:`exact_duplicates` / the pipeline's automatic
    exact-collapse in cluster mode), which removes the duplicated
    mass that makes the estimate quadratic."""

    def __init__(self, estimate: int, budget: int):
        self.estimate = int(estimate)
        self.budget = int(budget)
        super().__init__(
            f"ngram candidate estimate {self.estimate} exceeds budget "
            f"{self.budget}: the corpus is heavily duplicated — run "
            "exact dedup (llm.dedup.exact_duplicates) before n-gram "
            "candidate generation, or raise candidate_budget"
        )


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate (driver-side, no job);
    None when the JVM call is unavailable."""
    try:
        # py4j converts the Scala BigInt to a Python int directly
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 100,
    prefix_filter: bool | None = None,
    auto_prefix_bytes: int | None = None,
    candidate_budget: int | None = None,
    observation=None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via shingle inverted index
    (no MinHash approximation).

    ``candidate_budget`` guards the one measured superlinearity of
    this operator: candidate volume is Σ C(df, 2) over posting lists,
    which grows QUADRATICALLY in the duplication factor of the corpus
    (the sf1 stress run measured 27× candidates at 10× data on a
    10-way-duplicated synthetic).  When set, the estimate is computed
    from the posting lengths (one cheap aggregate over the already-
    persisted index — pass A is shared) BEFORE any pair explodes, and
    a :class:`NgramCandidateBudgetError` aborts the query if it would
    exceed the budget — with the operational fix (run
    :func:`exact_duplicates` first; the corpus pipeline's cluster mode
    does this automatically) in the message.  ``observation`` (a
    ``pyspark.sql.Observation``) additionally surfaces the same
    estimate as an observed metric ``n_candidates`` on the executed
    plan; when omitted the plan still carries a named
    ``ngram_candidate_budget`` CollectMetrics node for listener-based
    monitoring — either way the guard metric is free (it rides the
    posting lists the plan aggregates anyway).  Caveat: when the
    corpus yields ZERO candidates, adaptive execution's empty-relation
    propagation can prune the CollectMetrics node out of the runtime
    plan, leaving the Observation empty — read it only when the pair
    count is nonzero (a zero-candidate run needs no budget guard).

    ``max_shingle_freq`` drops shingles appearing in more documents
    than the cap before the pair join — the standard stop-shingle
    guard that keeps the self-join near-linear at scale.  Pairs are
    only *generated* from surviving shingles, but Jaccard is computed
    on the FULL shingle sets, so scores are exact; only pairs whose
    every common shingle is ultra-frequent can be missed (documented
    approximation, disabled at the cap used in the declared query).

    ``prefix_filter=True`` switches candidate generation to
    SSJoin-style prefix filtering (Chaudhuri et al., ICDE'06): each
    doc indexes only its ``n - ceil(t*n) + 1`` globally-rarest
    surviving shingles (canonical order = (df, shingle) ascending),
    plus the size-compatibility predicate ``t*n_a <= n_b <= n_a/t``
    on the self-join.  Any pair with Jaccard >= t must collide inside
    those prefixes, so the output is IDENTICAL (equivalence-tested);
    the prefix length is computed from the FULL set size, which keeps
    the guarantee even though frequent shingles are excluded from the
    index (at most ``n - |rare|`` common shingles can be frequent).
    Measured at sf0.1 it cuts candidates 1.13M -> ~0.4M but costs two
    extra small stages, a wash locally — at 100 TB the candidate
    volume is the dominant shuffle and prefix filtering is strictly
    right.

    ``prefix_filter=None`` (default) AUTO-SELECTS from Catalyst's
    optimized-plan size estimate of ``docs`` (driver-side, no job):
    prefix filtering turns on at/above ``auto_prefix_bytes`` (default
    :data:`NGRAM_PREFIX_AUTO_BYTES`, 1 GiB) or when the estimate is
    unavailable (unknown inputs are presumed large — the at-scale
    plan is the safe default).  Callers never need to know the flag;
    explicit True/False still forces a mode.

    PERF (measured at sf0.1, local[32]; ~3.1-3.8 s honest steady-state
    after the round-3 cache scoping — the round-2 bench's 2.8 s was
    partially warm because leaked persists from earlier invocations
    were being re-hit across bench passes.  Candidate-pair generation
    dominates: ~2.7 s for the 1.13M pairs this fixture yields under
    the df cap):

    * The per-doc shingle *array* is computed behind an explicit
      ``repartition`` (a single parquet file otherwise serializes the
      regexp tokenizer onto one core — 41 s vs 10 s); tokenize and
      shingle run in SEPARATE selects so Catalyst binds the token
      array instead of re-running the regex per shingle index (see
      ``shingles_from_tokens``).
    * Shingle identity is the md5-derived 60-bit INTEGER, not the
      string: the inverted-index self-join and every groupBy key on
      int64 instead of ~40-char strings (smaller shuffles, cheaper
      hash probes).  A hash collision (~n²/2^61) would merge two
      shingles identically in both engines (the oracle hashes the
      same way), so the gate stays exact; semantically Jaccard
      becomes exact-modulo-astronomically-rare-collision.
    * The HASHED arrays are persisted: int64 arrays cache ~4× cheaper
      than the shingle strings they replace, and caching amortizes
      the md5+base-conversion hashing across the consumers.
    * The stop-shingle (df cap) filter costs NO extra shuffle: in
      default mode it is FUSED into the posting aggregate (a stop
      shingle is simply a too-long posting list, dropped after the
      groupBy); in prefix mode it is a ``when`` inside the per-doc
      aggregate over the df-joined rows (the df table is needed
      there anyway for the canonical prefix order).
    * Candidate generation is POSTING-LIST based (round 5): the index
      aggregates into one sorted doc-list row per shingle (bounded by
      the df cap) and pairs explode from within-list combinations
      MAP-SIDE — replacing the former inverted-index self-join, which
      shuffled every (shingle, doc) row twice (build + probe) and
      materialized the raw join output before the dedup groupBy.
      Together with the fused stop filter: 2.91 s -> ~1.9-2.1 s
      steady at sf0.1 depending on host load (the r3 target was
      <= 2.0 s; candidate explode + pair groupBy now dominate).
    * Verification: the pair groupBy both dedupes candidates and (in
      the default mode) counts common rare shingles; exact Jaccard
      then comes from ONE ``array_intersect`` over the two cached
      per-doc arrays (two joins against the 2-column cached frame —
      AQE broadcasts them at bench scale, shuffles at 100 TB where
      only *candidate* docs' arrays move).  This replaced the round-2
      four-join tail (sizes ×2 + frequent-shingle arrays ×2): one
      array intersect counts rare and frequent commons alike —
      measured 3.3 s -> 2.7 s cold at sf0.1, byte-identical output.
    """
    spark = docs.sparkSession
    release_ngram_cache()
    if prefix_filter is None:
        limit = (
            NGRAM_PREFIX_AUTO_BYTES
            if auto_prefix_bytes is None
            else auto_prefix_bytes
        )
        est = _plan_size_bytes(docs)
        prefix_filter = est is None or est >= limit
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # r14: construction as SQL text (same py4j-cost rationale and
    # two-phase tokenize/shingle protection as minhash_candidate_pairs)
    from sample_keyspaces_cdc_streams_connectors_spark.functions.text import (
        md5_int_sql,
        normalize_text_sql,
        shingles_from_tokens_sql,
        tokens_sql,
    )

    arrs = (
        docs.repartition(nparts)
        .selectExpr(
            "doc_id", f"{tokens_sql(normalize_text_sql(text_col))} AS __toks"
        )
        .selectExpr(
            "doc_id",
            "array_distinct(transform("
            f"{shingles_from_tokens_sql('__toks', k)}, "
            f"x -> {md5_int_sql('x')})) AS __shingles",
        )
        .persist()
    )
    _NGRAM_CACHE.append(arrs)
    sh = arrs.select(
        "doc_id",
        F.size("__shingles").alias("n"),
        F.explode("__shingles").alias("shingle"),
    )
    if prefix_filter:
        # SSJoin prefix filter: canonical order (df asc, shingle asc);
        # each doc indexes its n - ceil(t*n) + 1 rarest SURVIVING
        # shingles, n taken over the FULL set (see docstring).
        dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        plen = (
            F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
        ).cast("int")
        per = (
            sh.join(dfreq, "shingle")
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n"),
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("df") <= max_shingle_freq,
                            F.struct("df", "shingle"),
                        )
                    )
                ).alias("__rs"),
            )
        )
        index = per.select(
            "doc_id",
            "n",
            F.explode(
                F.slice(
                    F.transform("__rs", lambda s: s["shingle"]), F.lit(1), plen
                )
            ).alias("shingle"),
        )
    # All ordered (i < j) element pairs within one sorted posting
    # list, as a single JVM array expression.  List length is bounded
    # by construction (df <= max_shingle_freq — prefix indexing only
    # shrinks lists further), so the per-list expansion is O(cap²)
    # worst case and runs MAP-SIDE after the posting aggregate — no
    # self-join.  SQL text (r14): the Column form of this
    # doubly-nested HOF cost ~0.1 s of py4j per construction.
    _pairs_sql = (
        "flatten(transform(__ds, (x, i) -> "
        "transform(slice(__ds, i + 2, greatest(size(__ds) - i - 1, 0)), "
        "y -> struct(x AS a, y AS b))))"
    )

    # candidate-budget guard: Σ C(len, 2) over the pair-generating
    # posting lists — the exact number of (pre-distinct) pairs the
    # explode below would emit.  Free when only observed (it rides
    # the lists the plan aggregates anyway); the eager budget check
    # costs one extra aggregate over the persisted index.
    def _cand_metric() -> Column:
        sz = F.size("__ds").cast("bigint")
        return F.sum((sz * (sz - 1) / 2).cast("bigint")).alias(
            "n_candidates"
        )

    def _guarded(src: DataFrame) -> DataFrame:
        if candidate_budget is not None:
            est = src.agg(_cand_metric()).first()["n_candidates"] or 0
            if est > candidate_budget:
                raise NgramCandidateBudgetError(est, candidate_budget)
        if observation is not None:
            return src.observe(observation, _cand_metric())
        return src.observe("ngram_candidate_budget", _cand_metric())

    # size-compatibility predicate (t*n_a <= n_b <= n_a/t) on FULL
    # set sizes — any pair with Jaccard >= t satisfies it, so it is
    # a pure prune, applied BEFORE the pair shuffle in both modes
    def _size_ok(p: Column) -> Column:
        return (p["b"]["sz"] * F.lit(threshold) <= p["a"]["sz"]) & (
            p["a"]["sz"] * F.lit(threshold) <= p["b"]["sz"]
        )

    _jaccard_out = lambda df: (  # noqa: E731 — shared final projection
        df.withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.col("jaccard")
            .cast("decimal(18,6)")
            .cast("double")
            .alias("jaccard"),
        )
    )

    # POSTING-LIST candidate generation (round 5): aggregate the index
    # into one sorted doc-list row per shingle, then explode the
    # within-list combinations.  The only shuffle carries |postings|
    # rows once (the groupBy) — the former inverted-index SELF-JOIN
    # shuffled the same rows TWICE (build + probe) and materialized
    # the join before the dedup groupBy could compress it.
    if prefix_filter:
        postings = index.groupBy("shingle").agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("doc_id").alias("d"), F.col("n").alias("sz"))
                )
            ).alias("__ds")
        )
        pairs = (
            _guarded(postings.filter(F.size("__ds") >= 2))
            .selectExpr(f"explode({_pairs_sql}) AS __p")
            .filter(_size_ok(F.col("__p")))
            .select(
                F.col("__p.a.d").alias("doc_a"),
                F.col("__p.b.d").alias("doc_b"),
            )
            .distinct()
        )
        # prefix-mode verify: the prefix index sees only each doc's
        # rarest shingles, so common counts must come from the FULL
        # cached arrays — one array_intersect per surviving candidate
        # (at 100 TB only candidate docs' arrays move through the
        # two joins)
        return _jaccard_out(
            pairs.join(
                arrs.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("__shingles").alias("__sa"),
                ),
                "doc_a",
            )
            .join(
                arrs.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("__shingles").alias("__sb"),
                ),
                "doc_b",
            )
            .select(
                "doc_a",
                "doc_b",
                F.size(F.array_intersect("__sa", "__sb")).alias("n_common"),
                F.size("__sa").alias("n_a"),
                F.size("__sb").alias("n_b"),
            )
        )

    # DEFAULT (small-input) mode, round-5 shape: one posting aggregate
    # serves candidate generation AND exact verification.
    #
    # * FUSED stop filter: a stop shingle IS a posting list longer
    #   than the df cap, so the posting aggregate subsumes the former
    #   separate frequency groupBy + broadcast anti-join.  Safe here
    #   because this branch is the SMALL-INPUT plan (the auto
    #   heuristic routes large/unknown inputs to prefix mode, whose
    #   per-doc aggregate never collects a hot shingle's full list).
    # * COUNTED verification: the pair groupBy COUNTS co-occurrences
    #   instead of deduping — that count is exactly the number of
    #   common rare (df <= cap) shingles.  Common FREQUENT shingles
    #   are recovered from per-doc hot-shingle arrays (tiny by
    #   construction: one entry per df>cap shingle the doc contains),
    #   so n_common = nc_rare + |hot_a ∩ hot_b| is EXACT over the
    #   full sets — and the former verify tail (two joins moving the
    #   full cached arrays + one big array_intersect per candidate)
    #   disappears.  Measured at sf0.1: 2.9 s -> ~1.9 s steady.
    # r15 examined, REJECTED: persisting the POSTING aggregate here
    # (instead of / in addition to arrs) looks right on paper — every
    # default-mode consumer reads postings — but measured FAR slower
    # in interleaved A/B at sf0.1 (min 2.254 s vs 1.274 s): the
    # array-of-struct posting cache is expensive to materialize and
    # blocks pipelining of the pair explode above it, the same
    # failure mode as the rejected r12/r14 shingle-frame caching.
    # Note the two hot_per_doc broadcast builds below already share
    # ONE exchange: Spark canonicalizes the renamed build sides
    # equal, so ReuseExchange fires (plans/r15/dedup_ngram_before.txt
    # node 35 reuses node 32) — there is no duplicate hot build to
    # save.
    postings = sh.groupBy("shingle").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("doc_id").alias("d"), F.col("n").alias("sz")
                )
            )
        ).alias("__ds")
    )
    counted = (
        _guarded(
            postings.filter(
                (F.size("__ds") >= 2) & (F.size("__ds") <= max_shingle_freq)
            )
        )
        .selectExpr(f"explode({_pairs_sql}) AS __p")
        .filter(_size_ok(F.col("__p")))
        .groupBy(
            F.col("__p.a.d").alias("doc_a"),
            F.col("__p.b.d").alias("doc_b"),
            F.col("__p.a.sz").alias("n_a"),
            F.col("__p.b.sz").alias("n_b"),
        )
        .agg(F.count("*").alias("__nc"))
    )
    # per-doc hot-shingle arrays: explode ONLY the df>cap postings
    # back to (doc, shingle) — row count is sum(df) over stop
    # shingles, small in this small-input branch by definition
    hot_per_doc = (
        postings.filter(F.size("__ds") > max_shingle_freq)
        .select("shingle", F.explode("__ds").alias("__e"))
        .groupBy(F.col("__e.d").alias("doc_id"))
        .agg(F.sort_array(F.collect_list("shingle")).alias("__hot"))
    )
    empty_hot = F.array().cast("array<long>")
    with_hot = (
        counted.join(
            F.broadcast(
                hot_per_doc.select(
                    F.col("doc_id").alias("doc_a"), F.col("__hot").alias("__ha")
                )
            ),
            "doc_a",
            "left",
        )
        .join(
            F.broadcast(
                hot_per_doc.select(
                    F.col("doc_id").alias("doc_b"), F.col("__hot").alias("__hb")
                )
            ),
            "doc_b",
            "left",
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("__nc")
                + F.size(
                    F.array_intersect(
                        F.coalesce(F.col("__ha"), empty_hot),
                        F.coalesce(F.col("__hb"), empty_hot),
                    )
                )
            ).alias("n_common"),
            "n_a",
            "n_b",
        )
    )
    return _jaccard_out(with_hot)


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.4,
    n_bits: int = 16,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_docs: int | None = None,
    broadcast_limit: int = 500_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via coordinate-sign LSH.

    Blocking: each vector's first ``n_bits`` coordinate signs form a
    bit signature, split into ``n_bits/band_bits`` bands; vectors
    sharing ANY band bucket become candidates (classic LSH
    OR-construction).  Candidates are then verified with the exact
    sequential-double cosine and thresholded.  Coordinate-sign planes
    (rather than random projections) keep the bucketing replicable in
    plain SQL while preserving the sign-LSH collision probability
    1 - theta/pi per bit on roughly-isotropic embeddings.

    Scale: the band self-join shuffles only (band, bucket, id) keys;
    exact cosine runs on candidate pairs only (~linear, not n²).
    Returns (vec_a, vec_b, cos) with vec_a < vec_b.

    Two physical modes, same pairs out:

    - **fused** (default, ``n_docs`` unknown or <= ``broadcast_limit``):
      each exploded band row carries its vector + norm, and the
      first-matching-band self-join scores in place.  Strictly cheapest
      while one side broadcasts — no candidate re-fetch.
    - **big** (``n_docs > broadcast_limit``): beyond broadcast size the
      band join becomes a shuffle join, and the fused layout would push
      ``n_bands x dims`` floats per vector through the exchange.  Here
      the band join moves ONLY integer keys (id + band buckets); the
      surviving candidate pairs then fetch both vectors in one
      post-join lookup against the base table, so each vector crosses
      a shuffle once per *surviving candidate*, not ``n_bands`` times
      per row.
    """
    from sample_keyspaces_cdc_streams_connectors_spark.functions.vectors import (
        dot_pandas,
        l2_norm,
        l2_norm_sql,
    )

    big = n_docs is not None and n_docs > broadcast_limit
    n_bands = n_bits // band_bits
    v = F.col(vec_col)

    # r14: the banding/bkt/first-match expressions are composed as SQL
    # text (ONE selectExpr/expr parse each) instead of per-node py4j
    # Column construction — this builder alone cost ~0.9 s of driver
    # round trips per invocation (guide §1.2: the measured bottleneck
    # was the driver loop, not the executors).  Expressions are
    # UNCHANGED token for token; the oracle gate re-verifies results.
    def band_bucket_sql(b: int) -> str:
        bits = [
            f"CASE WHEN (element_at({vec_col}, {b * band_bits + r + 1})"
            f" > 0) THEN {1 << r} ELSE 0 END"
            for r in range(band_bits)
        ]
        out = bits[0]
        for nxt in bits[1:]:
            out = f"({out} + {nxt})"
        return out

    # PERF (measured at sf0.1): one fused self-join instead of
    # candidates→distinct→two vector-fetch joins.  Each row carries its
    # vector, precomputed norm, and ALL band buckets; collisions are
    # deduplicated by the FIRST-matching-band predicate (a pair joins
    # only at its lowest agreeing band), so no distinct shuffle and no
    # re-materialization of 2×dims floats per candidate.  At very large
    # scale, where the band join becomes a shuffle join, switch the
    # heavy columns to a post-join fetch — here the build side is small
    # and broadcast, so carrying vectors is strictly cheaper.
    # big mode: the exploded band rows carry ONLY integer columns —
    # the vector/norm payload never enters the band-join shuffle.
    payload = (
        []
        if big
        else [f"{vec_col} AS emb", f"{l2_norm_sql(vec_col)} AS norm"]
    )
    band_list = ", ".join(str(b) for b in range(n_bands))
    sig = vectors.selectExpr(
        f"{id_col} AS vid",
        *payload,
        *[f"{band_bucket_sql(b)} AS b{b}" for b in range(n_bands)],
    ).selectExpr(
        "vid",
        *(() if big else ("emb", "norm")),
        *[f"b{b}" for b in range(n_bands)],
        f"explode(array({band_list})) AS band",
    )
    # the row's own band bucket — the concrete equi-join key (hash join
    # on (band, bkt); without it Spark could only equi-join on `band`,
    # degenerating to a near-cross-join)
    bkt = "CAST(NULL AS INT)"
    for j in range(n_bands):
        bkt = f"CASE WHEN (band = {j}) THEN b{j} ELSE {bkt} END"
    sig = sig.withColumn("bkt", F.expr(bkt))

    l, r = sig.alias("l"), sig.alias("r")

    # first-match: at band j, all earlier bands must differ
    first_match = "TRUE"
    for j in range(n_bands - 1, 0, -1):
        first_match = (
            f"CASE WHEN (l.band >= {j}) THEN "
            f"((NOT (l.b{j - 1} = r.b{j - 1})) AND {first_match}) "
            f"ELSE TRUE END"
        )

    def scored(pairs: DataFrame, emb_a, emb_b, norm_a, norm_b) -> DataFrame:
        denom = norm_a * norm_b
        cos = F.when(
            denom > 0,
            # Arrow-batched scoring: the candidate set is large
            # (any-band LSH collisions), and interpreted
            # zip_with/aggregate at ~500k pairs costs ~5s vs ~1s for
            # the bit-identical pandas dot
            dot_pandas(emb_a, emb_b) / denom,
        ).otherwise(F.lit(0.0))
        return (
            pairs.select("vec_a", "vec_b", cos.alias("cos"))
            .filter(F.col("cos") >= threshold)
            .select(
                "vec_a",
                "vec_b",
                F.col("cos")
                .cast("decimal(18,8)")
                .cast("double")
                .alias("cos"),
            )
        )

    candidates = l.join(
        r,
        F.expr(
            "(l.band = r.band) AND (l.bkt = r.bkt) "
            f"AND (l.vid < r.vid) AND {first_match}"
        ),
    )
    if not big:
        return scored(
            candidates.select(
                F.col("l.vid").alias("vec_a"),
                F.col("r.vid").alias("vec_b"),
                F.col("l.emb").alias("emb_a"),
                F.col("r.emb").alias("emb_b"),
                F.col("l.norm").alias("norm_a"),
                F.col("r.norm").alias("norm_b"),
            ),
            F.col("emb_a"),
            F.col("emb_b"),
            F.col("norm_a"),
            F.col("norm_b"),
        )

    # big mode: one post-join fetch of both vectors per surviving
    # candidate pair (two equi-joins on id against the base table).
    pair_keys = candidates.select(
        F.col("l.vid").alias("vec_a"), F.col("r.vid").alias("vec_b")
    )
    vecs = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("emb"),
        l2_norm(v).alias("norm"),
    )
    fa, fb = vecs.alias("fa"), vecs.alias("fb")
    fetched = (
        pair_keys.join(fa, F.col("vec_a") == F.col("fa.vid"))
        .join(fb, F.col("vec_b") == F.col("fb.vid"))
        .select(
            "vec_a",
            "vec_b",
            F.col("fa.emb").alias("emb_a"),
            F.col("fb.emb").alias("emb_b"),
            F.col("fa.norm").alias("norm_a"),
            F.col("fb.norm").alias("norm_b"),
        )
    )
    return scored(
        fetched,
        F.col("emb_a"),
        F.col("emb_b"),
        F.col("norm_a"),
        F.col("norm_b"),
    )


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """Per-document SimHash fingerprint (bit-majority of token hashes).

    bit_i(doc) = 1 iff sum over distinct tokens of (2*bit_i(h(tok))-1)
    is positive.  16 bits keeps the expression tree small while still
    giving a hamming-bucketable near-dup key; all bit math is integer
    arithmetic reproducible in SQL.

    SHAPE: computed as a NARROW per-row projection — hash the row's
    distinct tokens once, then ONE ``aggregate`` fold whose
    accumulator is a 16-field struct of bit sums.  No explode, no
    groupBy, ZERO shuffle (same stream-safe shape as
    :func:`with_minhash_signature`).  Replaced the round-2
    explode + 16-column groupBy-sum, which shuffled per-doc partial
    rows and paid an exploded-row materialization: measured at sf0.1
    1.4-1.8 s -> 1.2-1.3 s steady (6.3 -> 2.7 s cold), identical
    output; at 100 TB the win is structural (a map-only stage
    pipelines with whatever follows).
    """
    hashed = docs.select(
        "doc_id",
        F.transform(
            F.array_distinct(tokens(normalize_text(F.col(text_col)))),
            md5_int,
        ).alias("__hs"),
    ).filter(F.size("__hs") > 0)
    # token-less documents (empty/blank/NULL text) are OMITTED, same
    # as the round-2 explode+groupBy form and the DuckDB oracle's
    # unnest — an all-zero-sum fingerprint would otherwise cluster
    # every blank doc together at hamming distance 0
    code = simhash_fold(F.col("__hs"), bits)
    return hashed.select("doc_id", code.alias("simhash"))


def simhash_fold_sql(hs_sql: str, bits: int = 16) -> str:
    """SQL-text twin of :func:`simhash_fold` (r14 optimization: the
    Column form costs ~0.5 s of py4j round trips PER CONSTRUCTION —
    ~300 calls for the 16-field fold struct; the SQL text parses
    JVM-side in one call).  The bit-majority sum moves into the
    aggregate's finish lambda — same arithmetic, same result
    (equivalence pinned in tests/test_properties.py)."""
    acc0 = "struct(" + ", ".join(f"0L AS s{i}" for i in range(bits)) + ")"
    step = ", ".join(
        f"acc.s{i} + ((shiftright(h, {i}) & 1) * 2 - 1) AS s{i}"
        for i in range(bits)
    )
    final = " + ".join(
        f"(CASE WHEN acc.s{i} > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    return (
        f"CAST(aggregate({hs_sql}, {acc0}, "
        f"(acc, h) -> struct({step}), acc -> {final}) AS BIGINT)"
    )


def simhash_fold(hs: Column, bits: int = 16) -> Column:
    """The SimHash bit-majority fold as a pure Column over an array of
    64-bit token hashes — shareable by :func:`simhash` and any query
    that wants the fingerprint as one extra projection column (e.g.
    the consolidated ``text_analysis`` gate).  BIGINT code; callers
    decide how to treat empty arrays (:func:`simhash` filters them
    out beforehand)."""
    acc0 = F.struct(
        *[F.lit(0).cast("long").alias(f"s{i}") for i in range(bits)]
    )

    def step(acc: Column, h: Column) -> Column:
        return F.struct(
            *[
                (
                    acc[f"s{i}"]
                    + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1)
                ).alias(f"s{i}")
                for i in range(bits)
            ]
        )

    sums = F.aggregate(hs, acc0, step)
    return sum(
        [
            F.when(sums[f"s{i}"] > 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(bits)
        ],
        F.lit(0),
    ).cast("bigint")


def with_minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = NUM_HASHES,
    sig_col: str = "minhash_sig",
) -> DataFrame:
    """Append a per-row MinHash signature digest — the NARROW form of
    :func:`minhash_signatures`: every permutation minimum is an
    ``array_min`` over the row's own shingle-hash array, so the whole
    signature is computed inside one projection with NO explode, NO
    shuffle, and NO aggregation state.

    That shape is what makes MinHash usable in Structured Streaming
    (see ``streaming.dedup.streaming_near_dedup``): the only stateful
    operator in a streaming dedup pipeline is the final
    ``dropDuplicatesWithinWatermark`` on the digest — signature
    computation itself stays a stateless map.

    The digest is md5 over the comma-joined minima, identical to the
    grouped path's values (same md5→60-bit base hash, same affine
    permutation family, same distinct-shingle set; equivalence pinned
    in tests/test_streaming_dedup.py).  Two documents share a digest
    iff ALL ``num_hashes`` minima agree — a conservative
    near-identical guard (the banded OR-construction for lower
    thresholds remains the batch path).
    """
    toks = df.withColumn("__toks", tokens(normalize_text(F.col(text_col))))
    hashed = toks.withColumn(
        "__h30",
        F.transform(
            F.array_distinct(shingles_from_tokens(F.col("__toks"), k)),
            lambda s: md5_int(s) % _MERSENNE,
        ),
    )
    mins = [
        F.array_min(
            F.transform(
                F.col("__h30"),
                lambda h: (F.lit(_PERM_A[j]) * h + _PERM_B[j]) % _MERSENNE,
            )
        ).alias(f"__m{j}")
        for j in range(num_hashes)
    ]
    with_mins = hashed.select("*", *mins)
    digest = F.md5(
        F.concat_ws(",", *[F.col(f"__m{j}").cast("string") for j in range(num_hashes)])
    )
    return with_mins.withColumn(sig_col, digest).drop(
        "__toks", "__h30", *[f"__m{j}" for j in range(num_hashes)]
    )
