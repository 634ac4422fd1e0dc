"""Trainable hashed-bag-of-words quality classifier (fastText/CCNet
style).

Heuristic quality scores (``functions.text.quality_score``) rank
documents by surface statistics; production corpus pipelines follow
them with a LEARNED filter — a linear classifier over hashed token
features trained on a small labeled seed set (high-quality reference
pages vs crawl noise), the public recipe popularized by CCNet and the
GPT-3/LLaMA data notes.  The reference repo has no counterpart (its
only scoring is Bedrock embedding calls, VectorHelper.java:100-168);
this module adds the operator Spark-first.

Design — both halves distributed, nothing per-row in Python except
the Arrow-batched margin kernel:

- **Features**: tokens hash into ``n_buckets`` ids (md5-derived, the
  engine's portable hash) — a map-only projection; the per-doc
  feature array is the only thing that moves.
- **Scoring**: margin = bias + Σ w[bucket] per doc via ONE
  Arrow-batched pandas UDF against a numpy weight vector shipped in
  the closure (a 2^18-bucket float64 table is ~2 MB — broadcast-sized
  by construction, exactly like the k-means codebook).  Map-only: no
  shuffle, plan-pinned.
- **Training**: full-batch logistic regression, one gradient step per
  iteration: residuals are a map-only margin pass; the gradient is
  ``explode(features) → groupBy(bucket).agg(sum(residual))`` — the
  shuffle carries at most ``n_buckets`` rows of partials per task
  (map-side combine), independent of corpus size; the dense gradient
  collects to the driver (n_buckets floats) for the update, mirroring
  ``llm.kmeans``'s codebook loop.  Deterministic: zero init, fixed
  iteration count + early stop on loss plateau, no RNG anywhere.
  At 100 TB you train on a ``deterministic_sample`` of the corpus
  (labels are the scarce resource, not rows) and score the full
  corpus map-only.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from sample_keyspaces_cdc_streams_connectors_spark.functions.text import normalize_text, tokens
from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import md5_int


@dataclass(frozen=True)
class QualityModel:
    """Linear text-quality model: ``P(good) = sigmoid(bias + Σ w[h(token)])``."""

    weights: np.ndarray  # float64[n_buckets]
    bias: float
    n_buckets: int

    def __post_init__(self) -> None:
        if len(self.weights) != self.n_buckets:
            raise ValueError(
                f"weights length {len(self.weights)} != n_buckets {self.n_buckets}"
            )


def hashed_features(col: Column, n_buckets: int) -> Column:
    """Token → feature-bucket ids (array<int>, one id per token
    OCCURRENCE — counts matter, so no distinct)."""
    return F.transform(
        tokens(normalize_text(col)),
        lambda t: F.pmod(md5_int(t), F.lit(n_buckets)).cast("int"),
    )


def _margin_udf(weights: np.ndarray, bias: float):
    """Arrow-batched margin kernel, fully vectorized: the batch's
    ragged bucket arrays flatten into ONE gather + ONE segment-sum
    (``np.add.reduceat`` over the rows' offsets) — no per-row Python
    work beyond building the flat view, so the full-corpus scoring
    pass stays numpy-bound instead of interpreter-bound."""

    from sample_keyspaces_cdc_streams_connectors_spark.functions.ragged import ragged_segment_sums

    @F.pandas_udf(DoubleType())
    def margin(feats: pd.Series) -> pd.Series:
        sums = ragged_segment_sums(feats.values, lambda flat: weights[flat])
        return pd.Series(bias + sums)

    return margin


def score_quality(
    df: DataFrame,
    model: QualityModel,
    text_col: str = "text",
    score_col: str = "model_quality",
) -> DataFrame:
    """Append ``P(good)`` in [0,1] — map-only (feature projection +
    one Arrow margin pass), no shuffle at any scale."""
    margin = _margin_udf(model.weights, model.bias)
    feats = hashed_features(F.col(text_col), model.n_buckets)
    m = margin(feats)
    return df.withColumn(score_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-m)))


def train_quality_model(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = 1 << 18,
    n_iters: int = 50,
    lr: float = 0.5,
    l2: float = 1e-6,
    tol: float = 1e-4,
) -> QualityModel:
    """Fit the classifier on (text, label∈{0,1}) rows.

    Per iteration: one map-only margin/residual pass + ONE shuffle of
    per-partition gradient partials keyed by bucket (≤ n_buckets rows
    per task after map-side combine) + a driver-side dense update.
    Stops early when the training-loss improvement drops below
    ``tol`` (relative); loss is computed inside the same pass."""
    spark = labeled.sparkSession
    feats = (
        labeled.select(
            F.col(label_col).cast("double").alias("__y"),
            hashed_features(F.col(text_col), n_buckets).alias("__f"),
        )
        .persist()
    )
    try:
        n = feats.count()
        if n == 0:
            raise ValueError("empty training set")
        w = np.zeros(n_buckets, dtype=np.float64)
        bias = 0.0
        prev_loss = math.inf
        for _ in range(n_iters):
            margin = _margin_udf(w, bias)
            resid = feats.select(
                "__y",
                "__f",
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-margin(F.col("__f"))))
                ).alias("__p"),
            ).select(
                "__f",
                (F.col("__p") - F.col("__y")).alias("__r"),
                (
                    -F.col("__y") * F.log(F.greatest(F.col("__p"), F.lit(1e-12)))
                    - (F.lit(1.0) - F.col("__y"))
                    * F.log(F.greatest(F.lit(1.0) - F.col("__p"), F.lit(1e-12)))
                ).alias("__l"),
            )
            # sentinel bucket -1 carries the per-doc (once-counted)
            # residual and loss, so ONE groupBy/collect per iteration
            # yields gradient + bias-gradient + loss together
            agg = resid.select(
                F.explode(
                    F.concat(
                        F.array(F.lit(-1)), F.coalesce("__f", F.array())
                    )
                ).alias("bucket"),
                "__r",
                "__l",
            )
            rows = (
                agg.groupBy("bucket")
                .agg(F.sum("__r").alias("g"), F.sum("__l").alias("l"))
                .collect()
            )
            grad = np.zeros(n_buckets, dtype=np.float64)
            gb = loss = 0.0
            for row in rows:
                if row["bucket"] == -1:
                    gb, loss = float(row["g"]), float(row["l"]) / n
                else:
                    grad[row["bucket"]] = row["g"]
            w -= lr * (grad / n + l2 * w)
            bias -= lr * gb / n
            if prev_loss - loss < tol * max(prev_loss, 1e-12):
                break
            prev_loss = loss
        return QualityModel(weights=w, bias=bias, n_buckets=n_buckets)
    finally:
        feats.unpersist()


def save_quality_model(
    spark: SparkSession, model: QualityModel, path: str
) -> None:
    """Persist as a parquet of (bucket, weight) non-zero rows plus a
    one-row meta file — written THROUGH Spark, so the layout works on
    any Hadoop-visible filesystem (local, s3a, hdfs), not just the
    driver's disk."""
    nz = np.flatnonzero(model.weights)
    rows = [(int(b), float(model.weights[b])) for b in nz]
    spark.createDataFrame(
        rows or [(0, 0.0)], "bucket int, weight double"
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/weights")
    meta = json.dumps(
        {
            "bias": model.bias,
            "n_buckets": model.n_buckets,
            "n_nonzero": int(len(nz)),
        }
    )
    spark.createDataFrame([(meta,)], "meta string").repartition(
        1
    ).write.mode("overwrite").text(f"{path}/meta")


def load_quality_model(spark: SparkSession, path: str) -> QualityModel:
    meta = json.loads(
        spark.read.text(f"{path}/meta").collect()[0]["value"]
    )
    w = np.zeros(int(meta["n_buckets"]), dtype=np.float64)
    for row in spark.read.parquet(f"{path}/weights").collect():
        w[row["bucket"]] = row["weight"]
    return QualityModel(
        weights=w, bias=float(meta["bias"]), n_buckets=int(meta["n_buckets"])
    )
