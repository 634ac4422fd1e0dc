"""Sentence-aligned, token-bounded document chunking — the step
between corpus curation and sequence packing.

Long documents must be split into training-sized pieces at natural
boundaries; naive fixed-width splits cut sentences in half.  This
module splits text into sentences (regexp boundary) and packs
consecutive sentences into chunks bounded by ``max_tokens``,
REUSING the engine's size-bounded batcher
(`operators.batching.assign_messages` — the same machinery behind
the reference's message chunking and `pack_sequences`), so the bound
contract is uniform across the engine: a chunk holds at most
``max_tokens`` tokens *plus at most its largest sentence* (boundaries
fall at the first sentence whose exclusive running total crosses a
multiple of the budget; a single over-long sentence becomes its own
oversized chunk rather than vanishing).

Spark-first shape: sentence split + token count are map-only
(Generate + projection); chunk assignment is the batcher's ONE window
pass partitioned by document (a single hash-shuffle of sentence rows,
each carrying one sentence — document bodies never move whole); the
chunk texts reassemble in the same partitioning.  Everything is
deterministic and replay-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.functions.text import token_count
from sample_keyspaces_cdc_streams_connectors_spark.operators.batching import assign_messages

#: sentence boundary: terminal punctuation + whitespace, or newlines
_SENT_SPLIT = r"(?<=[.!?])\s+|\n+"


def split_sentences(col: Column) -> Column:
    """Sentence array (trimmed, non-empty) from raw text."""
    return F.filter(
        F.transform(F.split(col, _SENT_SPLIT), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per chunk: (``id_col``, ``chunk_idx``, ``chunk_text``,
    ``n_tokens``), sentences joined by a single space, chunk indexes
    0-based and dense per document.  Empty/blank documents produce no
    rows.  Bound: ``n_tokens <= max_tokens`` + the chunk's largest
    sentence (see module docstring)."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    sents = docs.select(
        F.col(id_col),
        F.posexplode(split_sentences(F.col(text_col))).alias(
            "__pos", "__sent"
        ),
    ).withColumn("__n", token_count(F.col("__sent")))
    assigned = assign_messages(
        sents,
        shard_col=id_col,
        seq_col="__pos",
        size_col=F.col("__n").cast("bigint"),
        max_message_size=max_tokens,
        max_records=-1,
    )
    from pyspark.sql import Window

    grouped = assigned.groupBy(
        F.col(id_col), F.col("message_idx").alias("__bucket")
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__sent"))
                ),
                lambda s: s["__sent"],
            ),
            " ",
        ).alias("chunk_text"),
        F.sum("__n").cast("bigint").alias("n_tokens"),
    )
    # buckets are monotone but sparse (floor of the running total);
    # re-index densely per document.  The window partitions by id_col
    # while the grouping hash-partitioned by (id_col, __bucket), so
    # this costs ONE more exchange — but over the chunk rows (output
    # cardinality), not the sentence rows, so it is the cheapest
    # frame in the plan to re-shuffle
    dense = (
        F.dense_rank().over(
            Window.partitionBy(id_col).orderBy("__bucket")
        )
        - 1
    )
    return grouped.withColumn("chunk_idx", dense.cast("int")).drop(
        "__bucket"
    )
