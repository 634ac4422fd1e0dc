"""Streaming near-duplicate suppression.

The reference has no dedup at all; its streaming shape (per-shard
ordered replay, KeyspacesRecordProcessor.java:41-60) makes a
streaming dedup stage the natural extension for a training-data
ingest pipeline: suppress near-identical documents AS THEY ARRIVE,
before they reach expensive downstream stages (embedding, storage).

Design — exactly one stateful operator:

1. :func:`llm.dedup.with_minhash_signature` appends the MinHash
   digest as a stateless narrow projection (array expressions only —
   no explode, no groupBy), so it runs identically in batch and
   streaming plans.
2. ``dropDuplicatesWithinWatermark`` keys the state store by digest;
   the event-time watermark EVICTS digests older than the delay, so
   state is bounded by (arrival rate × delay), not by history — the
   property that keeps streaming dedup feasible at 100 TB/day.

Semantics: a document is suppressed iff a document with the SAME
full signature (all ``num_hashes`` minima equal — near-identical
text) was seen within the watermark delay.  Lower-threshold fuzzy
matching (banded OR-construction) stays a batch operation: deciding
"any band collides" per document needs a second stateful stage and
cross-batch pair state that watermark eviction cannot bound as
tightly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import NUM_HASHES, with_minhash_signature


def streaming_near_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "1 hour",
    k: int = 3,
    num_hashes: int = NUM_HASHES,
    sig_col: str = "minhash_sig",
) -> DataFrame:
    """Near-identical documents within ``delay`` of each other are
    reduced to their first arrival (append mode; state bounded by the
    watermark).  Works on any streaming DataFrame with an event-time
    column; the returned frame carries the signature column for
    downstream audit."""
    return (
        with_minhash_signature(
            stream, text_col=text_col, k=k, num_hashes=num_hashes, sig_col=sig_col
        )
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark([sig_col])
    )
