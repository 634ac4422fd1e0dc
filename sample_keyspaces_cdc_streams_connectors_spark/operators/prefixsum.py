"""Distributed, deterministic global prefix sum / row numbering.

The final stage of a training-data pipeline needs *global* order
statistics — "position of this document in the epoch-shuffled corpus"
and "cumulative token count before it" — to cut the corpus into
token-balanced shards.  The naive Spark spelling,
``Window.orderBy(h)`` with no ``partitionBy``, funnels the entire
dataset through ONE partition (Spark even warns about it); at 100 TB
that is not a slow plan, it is a dead one.

This module implements the classic two-pass parallel prefix sum,
made deterministic by *hash-prefix bucketing* instead of sampled
range partitioning:

1. every row gets a bucket = the top 16 bits of its order-hash,
   scaled to ``n_buckets`` — a pure function of the row, so bucket
   boundaries never depend on ``repartitionByRange`` sampling and the
   result is bit-identical across runs and input partitionings;
2. pass A aggregates per-bucket row counts and weight sums (ONE
   map-side-combined shuffle of ``n_buckets`` keys) and the driver
   folds them into exclusive offsets (``n_buckets`` rows — KBs);
3. pass B computes the *within-bucket* rank and running sum with an
   ordinary partitioned window (ONE data shuffle, each bucket
   ~``total/n_buckets`` rows sorted locally) and adds the broadcast
   offsets.

Because md5 is uniform, buckets are balanced with no skew handling
needed; lexicographic order of the lowercase-hex digest equals
numeric order of its bits, so bucket boundaries align exactly with
the global ``ORDER BY h`` — the two-pass result is *equal* to the
single-window spelling (pinned by tests/test_prefixsum.py against
both a local reference and the DuckDB oracle's plain global window).

No counterpart in the reference (its KCL pipeline never needs a
global order); this is the Spark-native zipWithIndex replacement
that stays in the DataFrame world and off the single-partition cliff.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_order_stats", "release_order_stats_cache"]

#: buckets are carved from the first 4 hex chars = 16 bits of the hash
_PREFIX_SPACE = 1 << 16

# persist=True runs register their cached input here; callers release
# it once the annotated result is materialized (the same scoped-release
# discipline as llm.dedup's ngram cache — never unpersist under a lazy
# consumer).
_ORDER_STATS_CACHE: list[DataFrame] = []


def release_order_stats_cache() -> None:
    """Unpersist every input cached by ``with_order_stats(persist=True)``.
    Call after the annotated DataFrame has been written/collected.

    GLOBAL release (the same contract as ``release_ngram_cache``): it
    frees ALL registered caches, so with several persist=True
    pipelines in flight in one session, release only after the LAST
    consumer materializes — an early release silently sends the other
    pipeline's pass B back through its full lineage."""
    while _ORDER_STATS_CACHE:
        _ORDER_STATS_CACHE.pop().unpersist()


def _bucket(hash_col: Column, n_buckets: int) -> Column:
    prefix = F.conv(F.substring(hash_col, 1, 4), 16, 10).cast("long")
    return ((prefix * n_buckets) / _PREFIX_SPACE).cast("int")


def with_order_stats(
    df: DataFrame,
    hash_col: str,
    tiebreak_cols: list[str],
    weight_col: str | None = None,
    n_buckets: int = 256,
    pos_col: str = "pos",
    cum_col: str = "cum",
    persist: bool = False,
) -> tuple[DataFrame, int, int]:
    """Annotate ``df`` with its global 0-based position (``pos_col``)
    and exclusive running weight sum (``cum_col``) under the total
    order ``(hash_col, *tiebreak_cols)``.

    ``hash_col`` must be a lowercase-hex digest column (md5-style) so
    bucket boundaries align with its lexicographic order.  Returns
    ``(annotated_df, total_rows, total_weight)`` — the totals fall out
    of pass A for free (no extra job).  ``weight_col=None`` skips the
    cumulative-sum column (pure row numbering).

    The input is computed twice (pass A aggregate + pass B window);
    both passes are pure functions of the input rows, so no caching
    is required for correctness.  When the lineage above ``df`` is
    expensive (e.g. a tokenize feeding ``weight_col``),
    ``persist=True`` caches the bucketed input MEMORY_AND_DISK so the
    lineage runs once: pass A's collect materializes the cache and
    pass B reads it.  The cache stays live (pass B's consumer is
    lazy); call :func:`release_order_stats_cache` after the annotated
    result is written/collected.
    """
    if not 1 <= n_buckets <= _PREFIX_SPACE:
        raise ValueError(f"n_buckets must be in [1, {_PREFIX_SPACE}]")
    bucketed = df.withColumn("_psb", _bucket(F.col(hash_col), n_buckets))
    if persist:
        from pyspark import StorageLevel

        bucketed = bucketed.persist(StorageLevel.MEMORY_AND_DISK)

    # pass A: per-bucket count/weight totals -> driver-side offsets
    aggs = [F.count(F.lit(1)).alias("_n")]
    if weight_col is not None:
        aggs.append(F.sum(F.col(weight_col).cast("long")).alias("_w"))
    try:
        stats = {
            r["_psb"]: (r["_n"], r["_w"] if weight_col is not None else 0)
            for r in bucketed.groupBy("_psb").agg(*aggs).collect()
        }
    except Exception:
        # a failed pass A (bad weight column, poisoned lineage) must
        # unpersist immediately — never leak the cache entry until an
        # unrelated caller happens to release
        if persist:
            bucketed.unpersist()
        raise
    if persist:
        # registered only after pass A materialized the cache
        _ORDER_STATS_CACHE.append(bucketed)
    offsets, row_off, w_off = [], 0, 0
    for b in sorted(stats):
        n, w = stats[b]
        offsets.append((b, row_off, w_off))
        row_off += n
        w_off += int(w or 0)
    if not offsets:  # empty input: annotate schema-compatibly
        out = bucketed.drop("_psb").withColumn(pos_col, F.lit(0).cast("long"))
        if weight_col is not None:
            out = out.withColumn(cum_col, F.lit(0).cast("long"))
        return out.limit(0), 0, 0

    off_df = df.sparkSession.createDataFrame(
        offsets, "_psb int, _row_off long, _w_off long"
    )

    # pass B: within-bucket window + broadcast offset add
    w = Window.partitionBy("_psb").orderBy(hash_col, *tiebreak_cols)
    local = bucketed.withColumn("_lpos", F.row_number().over(w) - 1)
    if weight_col is not None:
        local = local.withColumn(
            "_lcum",
            F.coalesce(
                F.sum(F.col(weight_col).cast("long")).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    out = local.join(F.broadcast(off_df), "_psb").withColumn(
        pos_col, (F.col("_lpos") + F.col("_row_off")).cast("long")
    )
    if weight_col is not None:
        out = out.withColumn(
            cum_col, (F.col("_lcum") + F.col("_w_off")).cast("long")
        )
    return (
        out.drop("_psb", "_lpos", "_lcum", "_row_off", "_w_off"),
        row_off,
        w_off,
    )
