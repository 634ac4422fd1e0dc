"""N-gram language-model fluency scoring (Stupid Backoff).

The third quality signal of the curation stack, next to the heuristic
score (``functions.text.quality_score``) and the learned classifier
(``llm.quality_model``): CCNet-style *fluency* filtering scores each
document under a language model trained on a trusted reference corpus
(e.g. an encyclopedia dump) and drops the worst-perplexity tail —
gibberish, boilerplate soup, and non-language content that keyword
heuristics miss.

Model: hashed unigram+bigram **Stupid Backoff** (Brants et al.,
EMNLP'07) — the scoring scheme built FOR corpus-scale counts: no
discounting, no normalization pass, just

    S(w_i | w_{i-1}) = count(w_{i-1} w_i) / count(w_{i-1})   if seen
                     = 0.4 · count(w_i) / N                  else
                     = 0.4 · oov_floor                       if OOV

(score, not a true probability — monotone for filtering, which is all
curation needs).  The document score is the mean log10 S per token;
``lm_perplexity = 10^(-score)`` for the familiar reading.

Scale shape (the DSIR/BPE discipline):

- TRAIN: tokens and adjacent pairs hash to 60-bit md5 ints and count
  in ONE exploded map-side-combined ``groupBy``; only the
  ``max_entries`` highest-count grams return through a
  ``TakeOrderedAndProject`` heap (deterministic (count, gram)
  tie-break).  The corpus text never moves — the shuffle carries
  (gram-hash, partial-count) pairs.  Dropping tail grams only makes
  their scores back off — graceful, not wrong.
- SCORE: the bounded count tables broadcast by closure into ONE
  Arrow ``pandas_udf`` — map-only, zero exchanges (plan-pinned).
  The python side re-derives the SAME 60-bit hash from
  ``hashlib.md5`` (equivalence-pinned against the JVM hashing in
  tests), so train and score agree on every gram identity.

No reference counterpart; extension surface per SURVEY.md §2.2
(north-star text analysis).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.functions.text import normalize_text, tokens
from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import md5_int

__all__ = [
    "NgramLm",
    "train_ngram_lm",
    "score_lm",
    "save_ngram_lm",
    "load_ngram_lm",
]

#: Stupid Backoff's fixed backoff weight (Brants et al. §5)
_ALPHA = 0.4


@dataclass(frozen=True)
class NgramLm:
    unigrams: dict[int, int]  # token-hash -> count
    bigrams: dict[int, int]  # pair-hash  -> count
    total_tokens: int  # N (pre-cap unigram mass)

    def __post_init__(self) -> None:
        if self.total_tokens < 1:
            raise ValueError("total_tokens must be >= 1")


def _gram_cols(text: Column) -> tuple[Column, Column]:
    """(unigram-hash array, bigram-hash array) for one document.

    The bigram identity hashes the two token hashes joined with a
    colon — reproducible from the unigram hashes alone, so the python
    scorer never needs the token strings."""
    toks = tokens(normalize_text(text))
    uni = F.transform(toks, lambda t: md5_int(t))
    bi = F.zip_with(
        F.slice(uni, 1, F.greatest(F.size(uni) - 1, F.lit(0))),
        F.slice(uni, 2, F.greatest(F.size(uni) - 1, F.lit(0))),
        lambda a, b: md5_int(F.concat_ws(":", a.cast("string"), b.cast("string"))),
    )
    return uni, bi


def train_ngram_lm(
    docs: DataFrame,
    text_col: str = "text",
    max_entries: int = 1_000_000,
) -> NgramLm:
    """Count-train on a (trusted) corpus: one exploded gram shuffle,
    bounded collect of the ``max_entries`` most frequent grams per
    order."""
    if max_entries < 1:
        raise ValueError(f"max_entries must be >= 1, got {max_entries}")
    uni, bi = _gram_cols(F.col(text_col))
    grams = docs.select(
        F.explode(
            F.concat(
                F.transform(uni, lambda h: F.struct(F.lit(1).alias("o"), h.alias("g"))),
                F.transform(bi, lambda h: F.struct(F.lit(2).alias("o"), h.alias("g"))),
            )
        ).alias("gram")
    ).select("gram.o", "gram.g")
    counted = grams.groupBy("o", "g").agg(F.count(F.lit(1)).alias("n"))
    total = (
        counted.filter(F.col("o") == 1)
        .agg(F.sum("n").alias("t"))
        .first()["t"]
    )
    rows = (
        counted.orderBy(F.desc("n"), F.asc("o"), F.asc("g"))
        .limit(max_entries)
        .collect()
    )
    unigrams = {r["g"]: r["n"] for r in rows if r["o"] == 1}
    bigrams = {r["g"]: r["n"] for r in rows if r["o"] == 2}
    return NgramLm(
        unigrams=unigrams, bigrams=bigrams, total_tokens=int(total or 1)
    )


def _score_udf(model: NgramLm):
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    # Java \s (ASCII-only) — NOT python \s (unicode-aware): tokens
    # must match the JVM tokenizer exactly
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    unigrams, bigrams = model.unigrams, model.bigrams
    n_total = model.total_tokens
    oov = 1.0 / (10.0 * n_total)

    def h60(s: str) -> int:
        # SAME 60-bit construction as llm.dedup.md5_int:
        # int(first 15 hex digits of md5)
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)

    # no inline type hints (module-level `from __future__ import
    # annotations` stringifies them; pandas_udf can't resolve those)
    def score(texts):
        # per-batch memoization: md5 costs per DISTINCT word / pair,
        # not per token (real corpora repeat words heavily; pure
        # caching, bit-identical results)
        hcache: dict = {}
        bcache: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            words = [w for w in ws.split(t.lower()) if w]
            if not words:
                out.append(None)
                continue
            hs = []
            for w in words:
                v = hcache.get(w)
                if v is None:
                    v = h60(w)
                    hcache[w] = v
                hs.append(v)
            lp = 0.0
            prev = None
            for i, h in enumerate(hs):
                s = None
                if prev is not None:
                    key = (prev, h)
                    bh = bcache.get(key)
                    if bh is None:
                        bh = h60(f"{prev}:{h}")
                        bcache[key] = bh
                    cb = bigrams.get(bh)
                    if cb is not None:
                        cu_prev = unigrams.get(prev)
                        if cu_prev:
                            s = cb / cu_prev
                if s is None:
                    cu = unigrams.get(h)
                    base = cu / n_total if cu else oov
                    s = base if prev is None else _ALPHA * base
                lp += math.log10(s)
                prev = h
            out.append(lp / len(hs))
        return pd.Series(out, dtype=np.float64)

    return F.pandas_udf(score, "double")


def score_lm(col: Column, model: NgramLm) -> Column:
    """Mean log10 Stupid-Backoff score per token (higher = more
    fluent under the training corpus); NULL for empty/NULL text.
    Map-only, zero exchanges (plan-pinned)."""
    return _score_udf(model)(col)


def lm_perplexity(col: Column, model: NgramLm) -> Column:
    """``10^(-score_lm)`` — the familiar perplexity reading (lower =
    more fluent)."""
    return F.pow(F.lit(10.0), -score_lm(col, model))


def save_ngram_lm(spark: SparkSession, model: NgramLm, path: str) -> None:
    """Persist as parquet of (order, gram, count) plus a meta row —
    written THROUGH Spark (object-store-safe)."""
    rows = [(1, g, c) for g, c in model.unigrams.items()] + [
        (2, g, c) for g, c in model.bigrams.items()
    ]
    spark.createDataFrame(
        rows or [(0, 0, 0)], "o int, g long, n long"
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/grams")
    spark.createDataFrame(
        [(model.total_tokens,)], "total_tokens long"
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_ngram_lm(spark: SparkSession, path: str) -> NgramLm:
    total = int(
        spark.read.parquet(f"{path}/meta").first()["total_tokens"]
    )
    unigrams: dict[int, int] = {}
    bigrams: dict[int, int] = {}
    for r in spark.read.parquet(f"{path}/grams").collect():
        if r["o"] == 1:
            unigrams[r["g"]] = r["n"]
        elif r["o"] == 2:
            bigrams[r["g"]] = r["n"]
    return NgramLm(unigrams=unigrams, bigrams=bigrams, total_tokens=total)
