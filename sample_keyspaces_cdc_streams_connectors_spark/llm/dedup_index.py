"""Incremental cross-corpus dedup: a persisted fingerprint index.

The batch dedup operators (`llm.dedup`) answer "which docs inside
THIS corpus duplicate each other".  Production ingestion asks a
different question every day: "which docs of this NEW batch already
exist in the 100 TB corpus we keep" — without re-reading the corpus.
This module persists the corpus's dedup keys once and anti-joins each
incoming batch against them:

- ``exact``  — the md5 content fingerprint (`functions.text.doc_fingerprint`)
- ``minhash`` — the narrow full-signature digest
  (`llm.dedup.with_minhash_signature`): near-identical suppression
  with the SAME key the streaming dedup path uses, so batch index,
  streaming dedup, and pipeline `near` mode agree on what counts as
  a duplicate.

Scale design:

- The index stores KEYS ONLY (16-byte md5 strings), laid out in 256
  ``bucket=XX`` partition directories by fingerprint prefix — at
  10^11 docs the whole index is a few TB of parquet while the
  corpus is 100 TB.
- The anti-join projects the batch to (id, key) first, joins on
  (bucket, key) — both sides shuffle ONLY keys and ids, never
  document text — and surviving ids re-join the full batch rows,
  which AQE broadcasts whenever a day's survivors fit (batch ≪
  corpus by construction).  Plan-pinned: no Exchange carries the
  text column.
- ``append_to_dedup_index`` appends the surviving batch's keys into
  the matching bucket directories (dynamic partition overwrite is
  NOT used — appends only add files, existing files are untouched),
  so daily ingestion is: dedup batch → append survivors → write
  survivors to the corpus.  Re-running the same batch then drops
  everything (idempotent ingest, pinned by test).
- Sustained appends fragment bucket directories (one file per bucket
  per batch); ``llm.maintenance.compact_dedup_index`` (r10) merges
  them in place — probe survivors identical, untouched buckets never
  read — and the ingest loop runs it every
  ``corpus.dedup-index-compact-every`` batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.functions.text import doc_fingerprint
from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import with_minhash_signature

#: supported key modes → (sub-directory, key column name)
_MODES = {
    "exact": ("exact", "fp"),
    "minhash": ("minhash", "fp"),
}


def _check_mode(mode: str) -> tuple[str, str]:
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {sorted(_MODES)}, got {mode!r}")
    return _MODES[mode]


def _with_key(
    docs: DataFrame, mode: str, text_col: str, shingle_k: int
) -> DataFrame:
    """Project (original columns…, fp) with the mode's dedup key."""
    if mode == "exact":
        return docs.withColumn("fp", doc_fingerprint(F.col(text_col)))
    return with_minhash_signature(
        docs, text_col=text_col, k=shingle_k, sig_col="fp"
    )


def _keys_frame(docs_with_key: DataFrame) -> DataFrame:
    """Distinct (bucket, fp) pairs — all the index ever stores."""
    return (
        docs_with_key.select(
            F.substring("fp", 1, 2).alias("bucket"), "fp"
        )
        .distinct()
    )


def build_dedup_index(
    docs: DataFrame,
    path: str,
    mode: str = "exact",
    text_col: str = "text",
    shingle_k: int = 3,
) -> None:
    """Create (overwrite) the index for ``mode`` from an existing
    corpus: one distinct-shuffle of 16-byte keys, written into 256
    prefix-bucket directories."""
    sub, _ = _check_mode(mode)
    keyed = _with_key(docs, mode, text_col, shingle_k)
    (
        _keys_frame(keyed)
        .repartition(F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/{sub}")
    )


def build_index_bloom(
    spark: SparkSession,
    path: str,
    mode: str = "exact",
    fpr: float = 0.01,
    bucketed: bool = False,
):
    """One-time Bloom summary of the standing index's keys, sized for
    ``fpr`` — pass to :func:`dedup_against_index` so per-batch probes
    touch the index only for might-be-present keys.

    ``bucketed=True`` builds ONE filter per index prefix-bucket (the
    256 ``bucket=XX`` directories the index is laid out in) as a
    :class:`~sample_keyspaces_cdc_streams_connectors_spark.functions.bloom.BucketedBloomFilter`
    — the scale form past ~10⁸ keys: the build is still ONE shuffle
    (the bucket joins the groupBy key), probes route each key to its
    bucket's bitset, appends OR into one bucket without touching the
    other 255, and the set persists ``partitionBy(bucket)``
    (``save_bloom_bucketed``) so a future cogroup-style probe opens
    only the buckets it sees.

    STALENESS IS UNSAFE here (unlike a cache): a key appended to the
    index after the filter was built would probe ``false`` and its
    duplicates would be declared fresh.  Rebuild after appends — or
    keep the filter fresh incrementally by OR-ing the appended keys'
    bits in (Bloom filters union by bitwise OR)."""
    from sample_keyspaces_cdc_streams_connectors_spark.functions.bloom import (
        build_bloom,
        build_bloom_bucketed,
        optimal_params,
    )

    sub, _ = _check_mode(mode)
    index = spark.read.parquet(f"{path}/{sub}")
    n = max(index.count(), 1)
    if bucketed:
        # per-bucket sizing: md5 prefixes are uniform, so every
        # bucket holds ~n/256 keys
        n_bits, k = optimal_params(max(1, (n + 255) // 256), fpr)
        return build_bloom_bucketed(
            index,
            "fp",
            F.conv(F.substring("fp", 1, 2), 16, 10).cast("int"),
            n_bits,
            k,
            n_buckets=256,
        )
    n_bits, k = optimal_params(n, fpr)
    return build_bloom(index, "fp", n_bits, k)


def dedup_against_index(
    batch: DataFrame,
    path: str,
    mode: str = "exact",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    keep_key: bool = False,
    bloom=None,
) -> DataFrame:
    """Rows of ``batch`` whose dedup key is NOT in the index.

    The anti-join sees only (id, bucket, key) on the batch side and
    (bucket, key) on the index side; survivors re-join the full batch
    rows by id (AQE-broadcast when the batch is small).  With
    ``keep_key`` the computed ``fp`` column survives — callers that
    go on to ``append_to_dedup_index`` the survivors should keep it
    to avoid recomputing signatures.

    With ``bloom`` (a :class:`~sample_keyspaces_cdc_streams_connectors_spark.functions.bloom.BloomFilter`
    over the index keys, see :func:`build_index_bloom`) the batch is
    prefiltered map-only: keys the filter rules out are fresh WITHOUT
    joining (no false negatives ⇒ identical survivors,
    equivalence-pinned); only might-be-present keys reach the
    anti-join.  At streaming ingest rates this turns the per-batch
    stream-static join into a probe over the (tiny) suspected-dup
    slice.  The filter must cover every key in the index — rebuild
    after appends before trusting it for later batches.

    PRECONDITION: ``id_col`` should be unique within the batch — this
    operator suppresses docs already in the STANDING index only;
    duplicates WITHIN the batch all survive together (within-batch
    dedup is a separate stage, ``corpus.dedup`` in the pipeline).
    The survivor-id frame is ``distinct``-ed before the re-join, so a
    batch that does carry repeated ids keeps each row exactly once
    rather than multiplying through the join."""
    sub, _ = _check_mode(mode)
    spark = batch.sparkSession
    # refuse to probe mid-maintenance-swap (r10): a bucket renamed
    # aside but not yet replaced would declare its keys fresh
    from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import check_no_pending_swap

    check_no_pending_swap(f"{path.rstrip('/')}/{sub}", spark)
    keyed = _with_key(batch, mode, text_col, shingle_k)
    slim = keyed.select(
        id_col, F.substring("fp", 1, 2).alias("bucket"), "fp"
    )
    index = spark.read.parquet(f"{path}/{sub}")
    if bloom is not None:
        from sample_keyspaces_cdc_streams_connectors_spark.functions.bloom import (
            BucketedBloomFilter,
            might_contain,
            might_contain_bucketed,
        )

        # one pass, inverted construction (r5 review finding — the
        # earlier fresh/suspect two-branch union consumed the probe
        # projection twice, evaluating the Arrow might_contain UDF
        # and the key computation once per branch): keep ONLY the
        # suspected-dup slice (the sole consumer of the probe), semi-
        # join it to the index for the ACTUAL dup ids, and anti-join
        # the batch against that.  Definitely-fresh rows still never
        # touch the index join (they fail the map-only filter), and
        # the id re-join now moves dup ids only — a strict shrink
        # from the fresh-majority id set.  No false negatives ⇒ dup
        # ids are exactly the batch keys present in the index ⇒
        # survivors identical (equivalence stays pinned).
        probe = (
            might_contain_bucketed(
                F.conv(F.col("bucket"), 16, 10).cast("int"),
                F.col("fp"),
                bloom,
            )
            if isinstance(bloom, BucketedBloomFilter)
            else might_contain(F.col("fp"), bloom)
        )
        suspects = slim.filter(probe)
        dup_ids = suspects.join(
            index, ["bucket", "fp"], "left_semi"
        ).select(id_col)
        out = keyed.join(dup_ids, id_col, "left_anti")
        return out if keep_key else out.drop("fp")
    fresh_ids = (
        slim.join(index, ["bucket", "fp"], "left_anti")
        .select(id_col)
        .distinct()
    )
    out = keyed.join(fresh_ids, id_col)
    return out if keep_key else out.drop("fp")


def append_to_dedup_index(
    survivors: DataFrame,
    path: str,
    mode: str = "exact",
    text_col: str = "text",
    shingle_k: int = 3,
) -> None:
    """Append the surviving batch's keys into the bucket directories.
    Pure file appends — existing index files are never rewritten (the
    same untouched-files contract as ``append_to_ivf_index``).  If
    ``survivors`` already carries an ``fp`` column (from
    ``dedup_against_index(keep_key=True)``) it is reused as-is."""
    sub, _ = _check_mode(mode)
    keyed = (
        survivors
        if "fp" in survivors.columns
        else _with_key(survivors, mode, text_col, shingle_k)
    )
    (
        _keys_frame(keyed)
        .repartition(F.col("bucket"))
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(f"{path}/{sub}")
    )
