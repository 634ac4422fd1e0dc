"""DSIR-style importance resampling for data selection.

The public recipe (Xie et al., NeurIPS'23 — "Data Selection for
Language Models via Importance Resampling"): estimate hashed n-gram
language models over a small TARGET corpus (the distribution you want
more of) and the RAW corpus, weight every raw document by its
log-likelihood ratio, and resample raw documents with Gumbel-perturbed
top-k — selecting data that looks like the target without training a
classifier.  Complements ``llm.quality_model`` (which needs labels;
DSIR needs only an exemplar corpus).

Spark-first layout, every stage bounded:

- **Profiles**: hashed unigram+bigram counts per corpus — explode +
  ONE groupBy(bucket) whose shuffle carries ≤ ``n_buckets`` rows per
  task after map-side combine, regardless of corpus size.
- **Model**: the per-bucket smoothed log ratio collects into a dense
  float64 table (~2 MB at 2^18 buckets) wrapped as a
  ``QualityModel`` — so scoring, persistence, and the map-only
  Arrow margin kernel are SHARED with the learned classifier.
- **Weights**: map-only pass (zero exchanges, plan-pinned).
- **Resampling**: Gumbel top-k with DETERMINISTIC noise — the Gumbel
  variate derives from ``md5(salt, doc_id)``, so the selected subset
  is a pure function of (salt, ids, model): reproducible across
  runs, partitionings, and engines, like ``deterministic_sample``.
  Top-k executes as ``TakeOrderedAndProject`` (per-partition heaps,
  no global sort).
"""

from __future__ import annotations


import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.functions.text import normalize_text, tokens
from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import md5_int
from sample_keyspaces_cdc_streams_connectors_spark.llm.quality_model import QualityModel, _margin_udf

#: Gumbel-noise resolution (1e-6 uniform granularity, never exactly 0/1)
_GUMBEL_MOD = 1_000_000


def ngram_buckets_from_tokens(toks: Column, n_buckets: int) -> Column:
    """Unigram + bigram feature-bucket ids (array<int>, one id per
    occurrence) from a MATERIALIZED token-array column.

    INLINING-TOLERANT: bigrams come from ``zip_with`` over two
    aligned slices, so no lambda references the outer token array —
    every ``toks`` reference sits at an HOF argument position.  The
    previous ``transform(sequence, i -> element_at(toks, i))`` form
    went quadratic whenever Catalyst inlined the tokenizer into the
    lambda: ``InferFiltersFromGenerate`` synthesizes a
    ``size(grams) > 0`` predicate below the explode, pushdown carries
    it (fully substituted) to the scan, and the per-element
    ``element_at(tokens(...), i)`` re-tokenized per bigram index —
    measured 12.5 s vs ~4 s for a 5k-doc count pass at sf0.1."""
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    grams = F.concat(toks, bigrams)
    return F.transform(
        grams, lambda g: F.pmod(md5_int(g), F.lit(n_buckets)).cast("int")
    )


def with_ngram_buckets(
    df: DataFrame,
    text_col: str,
    n_buckets: int,
    out_col: str = "__buckets",
) -> DataFrame:
    """Append the feature-bucket array, tokenizing ONCE behind a
    materialized projection (see ``ngram_buckets_from_tokens``)."""
    return (
        df.withColumn(
            "__nb_toks", tokens(normalize_text(F.col(text_col)))
        )
        .withColumn(
            out_col,
            ngram_buckets_from_tokens(F.col("__nb_toks"), n_buckets),
        )
        .drop("__nb_toks")
    )


def hashed_ngram_buckets(col: Column, n_buckets: int) -> Column:
    """Single-expression convenience form (tiny inputs only — the
    inlined tokenizer re-runs per bigram; hot paths use
    :func:`with_ngram_buckets`)."""
    return ngram_buckets_from_tokens(tokens(normalize_text(col)), n_buckets)


def ngram_bucket_counts(
    df: DataFrame, text_col: str = "text", n_buckets: int = 1 << 18
) -> DataFrame:
    """Per-bucket n-gram occurrence counts → (bucket int, cnt long).
    One explode + one groupBy; the shuffle is bucket-bounded."""
    return (
        with_ngram_buckets(df, text_col, n_buckets)
        .select(F.explode("__buckets").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def fit_importance_model(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    alpha: float = 1.0,
) -> QualityModel:
    """Fit the bucketed log-likelihood-ratio model.

    ``weights[b] = log P_target(b) - log P_raw(b)`` with add-``alpha``
    smoothing over ``n_buckets`` outcomes; returned as a
    :class:`QualityModel` (bias 0) so ``score_quality`` /
    ``save_quality_model`` / the Arrow margin kernel apply unchanged.
    Two bucket-bounded count aggregations + one driver-side dense
    subtraction; nothing here scales with corpus size."""
    t_rows = ngram_bucket_counts(target, text_col, n_buckets).collect()
    r_rows = ngram_bucket_counts(raw, text_col, n_buckets).collect()
    return _model_from_counts(t_rows, r_rows, n_buckets, alpha)


def _model_from_counts(t_rows, r_rows, n_buckets: int, alpha: float) -> QualityModel:
    """Smoothed log-ratio model from collected (bucket, cnt) rows —
    the single source of truth for the smoothing/normalization math
    (shared by :func:`fit_importance_model` and the one-scan
    :func:`select_like_target` path)."""
    t = np.zeros(n_buckets, dtype=np.float64)
    r = np.zeros(n_buckets, dtype=np.float64)
    for row in t_rows:
        t[row["bucket"]] = row["cnt"]
    for row in r_rows:
        r[row["bucket"]] = row["cnt"]
    t_tot = t.sum() + alpha * n_buckets
    r_tot = r.sum() + alpha * n_buckets
    w = np.log((t + alpha) / t_tot) - np.log((r + alpha) / r_tot)
    return QualityModel(weights=w, bias=0.0, n_buckets=n_buckets)


def importance_log_weights(
    df: DataFrame,
    model: QualityModel,
    text_col: str = "text",
    weight_col: str = "log_importance",
) -> DataFrame:
    """Append the per-document importance log-weight
    ``Σ w[h(gram)]`` — map-only (one Arrow margin pass)."""
    margin = _margin_udf(model.weights, model.bias)
    return (
        with_ngram_buckets(df, text_col, model.n_buckets)
        .withColumn(weight_col, margin(F.col("__buckets")))
        .drop("__buckets")
    )


#: above this k the exact heap path stops being the right physical
#: plan (TakeOrderedAndProject keeps a k-row heap per task and ships
#: n_tasks*k rows to one place) and selection switches to the
#: approx-quantile threshold prefilter
EXACT_TOP_K_LIMIT = 100_000


def gumbel_resample_top_k(
    df: DataFrame,
    k: int,
    weight_col: str = "log_importance",
    id_col: str = "doc_id",
    salt: str = "dsir",
    exact_limit: int = EXACT_TOP_K_LIMIT,
) -> DataFrame:
    """Sample ``k`` documents without replacement ∝ exp(weight) via
    the Gumbel-top-k trick, with hash-derived noise: the Gumbel
    variate is ``-log(-log(u))`` for ``u = (md5(salt,id) % M + 0.5)/M``
    — a pure function of (salt, id), so the draw is reproducible and
    partition-invariant.

    ``k <= exact_limit``: a per-partition top-k heap
    (``TakeOrderedAndProject``), never a global sort.

    ``k > exact_limit``: per-task k-row heaps funneling to the driver
    stop scaling, so the selection becomes threshold-based — ONE
    ``approxQuantile`` on the perturbed key at probability
    ``1 - k/n - 2*err`` (err = k/2n) gives a cutoff guaranteed (by
    the quantile-sketch rank bound) to admit at least k and at most
    ~2.5k candidates; the exact top-k heap then runs over only those
    candidates.  Output is IDENTICAL to the exact path
    (equivalence-tested) — the threshold is a prefilter, not an
    approximation of the result."""
    u = (
        md5_int(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
        % _GUMBEL_MOD
        + F.lit(0.5)
    ) / _GUMBEL_MOD
    gumbel = -F.log(-F.log(u))
    keyed = df.withColumn("__key", F.col(weight_col) + gumbel)
    if k > exact_limit:
        n = keyed.count()
        if k < n:
            # NULL weights sort last under the exact path's desc
            # ordering; approxQuantile IGNORES nulls, so the
            # prefilter must only run when the non-null population
            # alone can fill k — otherwise (or when the quantile
            # comes back empty / admits fewer than k survivors, both
            # possible with heavy null fractions) fall back to the
            # exact heap, which handles nulls correctly.
            cuts = []
            err = max(k / (2.0 * n), 1e-6)
            p_lo = max(0.0, 1.0 - k / n - 2.0 * err)
            cuts = keyed.approxQuantile("__key", [p_lo], err)
            if cuts:
                cand = keyed.filter(F.col("__key") >= cuts[0])
                if cand.count() >= k:
                    keyed = cand
    return (
        keyed.orderBy(F.desc("__key"), F.asc(id_col))
        .limit(k)
        .drop("__key")
    )


def _staged_buckets(
    raw: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """The frame :func:`select_like_target` persists: ONLY
    ``(id_col, __buckets)`` — the text column (and every other corpus
    column) must NOT ride the cache, or the one-scan property costs a
    corpus-sized text copy in storage (plan-pinned in
    tests/test_importance.py)."""
    return with_ngram_buckets(raw, text_col, n_buckets).select(
        id_col, "__buckets"
    )


def select_like_target(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 18,
    alpha: float = 1.0,
    salt: str = "dsir",
    exact_limit: int = EXACT_TOP_K_LIMIT,
) -> DataFrame:
    """End-to-end DSIR: fit the ratio model, weight raw docs, Gumbel
    top-k resample.  Returns the selected rows with their
    ``log_importance`` attached.

    The RAW corpus is scanned ONCE for features: only
    ``(id, bucket-array)`` is staged and cached (text never enters
    storage), the profile counts and the weighting pass both read
    that slim cache, and the selected ids join back to the full rows
    by id — the winners frame is k rows, so AQE broadcasts the join
    at typical k and the corpus side stays map-only.  The selection
    materializes eagerly (``localCheckpoint``) so the cache can be
    released before returning — at 100 TB the second full-corpus
    tokenize-and-hash pass this removes is the dominant cost, and
    the slim cache is ~10x smaller than caching the corpus rows.
    ``k > exact_limit`` switches the selection to the approx-quantile
    threshold path (see :func:`gumbel_resample_top_k`)."""
    bucketed = _staged_buckets(raw, text_col, id_col, n_buckets).persist()
    try:
        r_counts = (
            bucketed.select(F.explode("__buckets").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        t_counts = ngram_bucket_counts(target, text_col, n_buckets).collect()
        model = _model_from_counts(t_counts, r_counts, n_buckets, alpha)
        margin = _margin_udf(model.weights, model.bias)
        weighted = bucketed.select(
            id_col, margin(F.col("__buckets")).alias("log_importance")
        )
        winners = gumbel_resample_top_k(
            weighted,
            k,
            id_col=id_col,
            salt=salt,
            exact_limit=exact_limit,
        )
        return (
            raw.join(winners, id_col)
            .select(*raw.columns, "log_importance")
            .localCheckpoint(eager=True)
        )
    finally:
        bucketed.unpersist()
