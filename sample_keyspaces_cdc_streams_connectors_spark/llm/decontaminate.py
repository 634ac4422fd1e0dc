"""Eval-set decontamination: drop training documents that overlap a
benchmark/eval corpus.

Standard pre-training hygiene: any document sharing enough long
n-grams with an evaluation set is presumed contaminated (the eval
answer leaked into the training data) and removed.  The usual recipe
(long k-grams, small overlap threshold) follows GPT-3/PaLM-style
decontamination: k around 8-13 whole words, flag on any (or a few)
collisions.

Spark-first shape — the eval side is SMALL by construction (eval sets
are thousands of docs, the corpus is billions):

1. eval texts -> distinct 60-bit k-gram hashes via the same
   normalize/tokenize/shingle/md5 stack as the dedup operators (so
   tokenization quirks cannot desynchronize the two sides);
2. the corpus explodes its k-gram hashes (a map-only ``Generate`` —
   no shuffle) and probes them against the BROADCAST eval-hash
   table; only COLLISION rows survive the join, so the one shuffle
   (the per-doc collision count) carries contaminated grams only —
   near-zero for a clean corpus;
3. rows with >= ``min_collisions`` matching k-grams are dropped (or
   kept and flagged, for auditing).

Why not ``array_intersect`` against one collected eval array: that
evaluates per ROW at O(|eval grams|) — fine for toy eval sets,
catastrophic at a million grams.  The broadcast hash join probes each
corpus gram in O(1) against a build side constructed once per task.

At 100 TB: corpus side is explode + broadcast-probe (map-only), the
collision-count shuffle is proportional to contamination (not corpus
size), and the final flag join is an AQE-broadcast of the (small)
contaminated-id table against the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.functions.text import (
    normalize_text,
    shingles_from_tokens,
    tokens,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import md5_int

__all__ = [
    "contamination_flags",
    "contamination_flags_map_only",
    "decontaminate",
    "decontaminate_map_only",
    "eval_gram_hashes",
    "eval_gram_table",
]


def _gram_hashes(text_col: Column, k: int) -> Column:
    return F.array_distinct(
        F.transform(
            shingles_from_tokens(tokens(normalize_text(text_col)), k),
            md5_int,
        )
    )


def eval_gram_hashes(
    eval_docs: DataFrame, text_col: str = "text", k: int = 8
) -> DataFrame:
    """Distinct k-gram hashes of the eval corpus — the (small)
    broadcast membership table, one ``gram`` column."""
    return (
        eval_docs.select(
            F.explode(_gram_hashes(F.col(text_col), k)).alias("gram")
        )
        .distinct()
    )


def contamination_flags(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    min_collisions: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Append ``n_eval_collisions`` and ``contaminated`` to ``docs``
    (see module docstring for the plan shape)."""
    grams = eval_gram_hashes(eval_docs, text_col=text_col, k=k)
    corpus_grams = docs.select(
        F.col(id_col),
        F.explode(_gram_hashes(F.col(text_col), k)).alias("gram"),
    )
    counts = (
        corpus_grams.join(F.broadcast(grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_eval_collisions"))
    )
    return (
        docs.join(counts, id_col, "left")
        .withColumn(
            "n_eval_collisions",
            F.coalesce("n_eval_collisions", F.lit(0)).cast("long"),
        )
        .withColumn(
            "contaminated",
            F.col("n_eval_collisions") >= F.lit(min_collisions),
        )
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    min_collisions: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop contaminated rows; schema of ``docs`` is preserved."""
    flagged = contamination_flags(
        docs,
        eval_docs,
        text_col=text_col,
        k=k,
        min_collisions=min_collisions,
        id_col=id_col,
    )
    return flagged.filter(~F.col("contaminated")).select(*docs.columns)


def eval_gram_table(
    eval_docs: DataFrame, text_col: str = "text", k: int = 8
):
    """Collect the eval corpus' distinct k-gram hashes into a SORTED
    int64 array and broadcast it — the build side for the map-only
    probe (:func:`contamination_flags_map_only`).

    Eval sets are thousands of documents (module docstring), so the
    collected array is megabytes: the same broadcast-sized-by-
    construction argument as the k-means codebook.  Build ONCE per
    query (this runs a small Spark job), reuse across micro-batches.
    """
    vals = [
        r["gram"]
        for r in eval_gram_hashes(
            eval_docs, text_col=text_col, k=k
        ).collect()
    ]
    arr = np.sort(np.asarray(vals, dtype=np.int64))
    return eval_docs.sparkSession.sparkContext.broadcast(arr)


def contamination_flags_map_only(
    docs: DataFrame,
    gram_table,
    text_col: str = "text",
    k: int = 8,
    min_collisions: int = 1,
) -> DataFrame:
    """STATELESS variant of :func:`contamination_flags`: the per-doc
    collision count comes from ONE Arrow-batched membership probe
    against the broadcast sorted eval-gram array — no explode, no
    aggregation, no join, so it applies unchanged to a streaming
    DataFrame in append mode (the batch operator's
    groupBy-per-doc-count is a stateful aggregation under Structured
    Streaming).

    IDENTICAL decisions to the join formulation: both sides hash with
    the same normalize/tokenize/shingle/md5 stack, both count
    DISTINCT doc grams present in the eval set (equivalence pinned in
    tests).  Kernel shape mirrors the margin kernel: flatten the
    batch's ragged gram arrays, one vectorized ``searchsorted``
    membership test, one ``np.add.reduceat`` segment sum.

    ``gram_table`` is the broadcast from :func:`eval_gram_table`.
    At 100 TB this is the cheapest possible shape — map-only over the
    corpus, zero shuffle — at the price of holding the eval grams in
    executor memory (fine for eval-scale tables; use the join variant
    if the "eval" side is itself corpus-sized)."""

    from sample_keyspaces_cdc_streams_connectors_spark.functions.ragged import ragged_segment_sums

    @F.pandas_udf("long")
    def n_collisions(gram_arrays: pd.Series) -> pd.Series:
        table = gram_table.value
        if not table.size:
            return pd.Series(np.zeros(len(gram_arrays), dtype=np.int64))

        def membership(flat: np.ndarray) -> np.ndarray:
            idx = np.minimum(np.searchsorted(table, flat), table.size - 1)
            return (table[idx] == flat).astype(np.int64)

        return pd.Series(
            ragged_segment_sums(gram_arrays.values, membership, dtype=np.int64)
        )

    counts = n_collisions(_gram_hashes(F.col(text_col), k))
    return docs.withColumn(
        "n_eval_collisions", counts
    ).withColumn(
        "contaminated",
        F.col("n_eval_collisions") >= F.lit(min_collisions),
    )


def decontaminate_map_only(
    docs: DataFrame,
    gram_table,
    text_col: str = "text",
    k: int = 8,
    min_collisions: int = 1,
) -> DataFrame:
    """Drop contaminated rows with the stateless probe — the
    stream-safe analog of :func:`decontaminate` (schema preserved)."""
    flagged = contamination_flags_map_only(
        docs,
        gram_table,
        text_col=text_col,
        k=k,
        min_collisions=min_collisions,
    )
    return flagged.filter(~F.col("contaminated")).select(*docs.columns)
