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


def hashed_ngram_buckets(col: Column, n_buckets: int) -> Column:
    """Unigram + bigram feature-bucket ids per document (array<int>,
    one id per occurrence).  Bigrams are built from the materialized
    token array inside one expression tree — no explode until the
    caller decides to aggregate."""
    toks = tokens(normalize_text(col))
    n = F.size(toks)
    bigrams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    return F.transform(
        grams, lambda g: F.pmod(md5_int(g), F.lit(n_buckets)).cast("int")
    )


def ngram_bucket_counts(
    df: DataFrame, text_col: str = "text", n_buckets: int = 1 << 18
) -> DataFrame:
    """Per-bucket n-gram occurrence counts → (bucket int, cnt long).
    One explode + one groupBy; the shuffle is bucket-bounded."""
    return (
        df.select(
            F.explode(
                hashed_ngram_buckets(F.col(text_col), n_buckets)
            ).alias("bucket")
        )
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
    return df.withColumn(
        weight_col,
        margin(hashed_ngram_buckets(F.col(text_col), model.n_buckets)),
    )


def gumbel_resample_top_k(
    df: DataFrame,
    k: int,
    weight_col: str = "log_importance",
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """Sample ``k`` documents without replacement ∝ exp(weight) via
    the Gumbel-top-k trick, with hash-derived noise: the Gumbel
    variate is ``-log(-log(u))`` for ``u = (md5(salt,id) % M + 0.5)/M``
    — a pure function of (salt, id), so the draw is reproducible and
    partition-invariant.  Executes as a per-partition top-k heap
    (``TakeOrderedAndProject``), never a global sort."""
    u = (
        md5_int(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
        % _GUMBEL_MOD
        + F.lit(0.5)
    ) / _GUMBEL_MOD
    gumbel = -F.log(-F.log(u))
    return (
        df.withColumn("__key", F.col(weight_col) + gumbel)
        .orderBy(F.desc("__key"), F.asc(id_col))
        .limit(k)
        .drop("__key")
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
) -> DataFrame:
    """End-to-end DSIR: fit the ratio model, weight raw docs, Gumbel
    top-k resample.  Returns the selected rows with their
    ``log_importance`` attached."""
    model = fit_importance_model(
        target, raw, text_col=text_col, n_buckets=n_buckets, alpha=alpha
    )
    weighted = importance_log_weights(raw, model, text_col=text_col)
    return gumbel_resample_top_k(
        weighted, k, id_col=id_col, salt=salt
    )
