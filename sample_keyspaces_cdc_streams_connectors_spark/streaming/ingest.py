"""Streaming curation-ingest loop: curate each micro-batch and keep
every configured STANDING index current, so the next batch dedups
against this one.

The standing-index modules each document the loop their append path
serves (probe → sink survivors → append —
``llm.dedup_index.append_to_dedup_index``,
``llm.semdedup.append_to_semantic_index``,
``llm.retrieval.append_to_text_index``); this module is that loop,
assembled once, config-driven, as a ``foreachBatch`` callable —
the engine's ingestion story in one place:

1. the batch flows through the stream-safe curation chain
   (:func:`~sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline.build_streaming_curation` stages —
   including probes of the standing dedup/semantic indexes, which
   re-list their files at each batch's plan build, so appends from
   PREVIOUS batches are visible);
2. survivors persist (cached once — the writes below share one
   materialization) and append into the output dataset;
3. every configured standing index extends with the survivors:
   ``corpus.dedup-index-path`` (fingerprints), ``corpus.
   semantic-index-path`` (hash-embedded unit vectors at
   ``semantic-dims``), and ``corpus.text-index-path`` (r8 — the BM25
   retrieval index over the curated corpus; ingest-only key, the
   curation chain itself never reads it).

Semantics: foreachBatch batches run SEQUENTIALLY, so batch N+1's
probes see batch N's appends — cross-batch dedup without global
state.  Delivery is Structured Streaming's at-least-once for
foreachBatch: a retried batch re-appends (the standard caveat —
exactly-once needs an idempotent target or a transactional table
format; the reference's sinks carry the same per-batch retry
semantics, KeyspacesRecordProcessor.java:41-60).  Fragmentation from
sustained appends is repaired in place by the r9 maintenance pair —
``llm.maintenance.compact_text_index`` (posting buckets + vocabulary
segments, probes bit-identical) and
``llm.maintenance.rebalance_ivf_index`` (recluster + defragment, no
source table needed); ``build_dedup_index`` / ``write_semantic_index``
rebuilds remain the story for the dedup and semantic indexes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.config import EngineConfig

__all__ = ["curation_ingest_sink"]

_P = "keyspaces-cdc-streams.corpus"


def curation_ingest_sink(
    cfg: EngineConfig,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` callable for the curation-ingest
    loop.  Usage::

        stream.writeStream.foreachBatch(
            curation_ingest_sink(cfg, out_dir)
        ).trigger(availableNow=True).start()

    Every batch: curate (the stream-safe stage subset incl. standing-
    index probes) → append survivors to ``out_path`` (parquet) →
    extend each configured standing index.  Batch-only corpus keys
    raise at BUILD time (same validation as the curation chain), not
    mid-stream."""
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_streaming_curation

    # build once: validates config eagerly; the returned transform is
    # stateless and applies to the batch frames below
    curate = build_streaming_curation(cfg, text_col=text_col, id_col=id_col)
    dedup_index_path = cfg.get(f"{_P}.dedup-index-path", None)
    dedup_index_mode = (
        cfg.get(f"{_P}.dedup-index-mode", "exact") or "exact"
    ).lower()
    shingle_k = cfg.get_int(f"{_P}.shingle-k", default=3)
    semantic_index_path = cfg.get(f"{_P}.semantic-index-path", None)
    semantic_dims = cfg.get_int(f"{_P}.semantic-dims", default=64)
    text_index_path = cfg.get(f"{_P}.text-index-path", None)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        survivors = curate(batch_df).persist()
        try:
            if survivors.limit(1).count() == 0:
                return
            survivors.write.mode("append").parquet(out_path)
            if dedup_index_path:
                from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import append_to_dedup_index

                append_to_dedup_index(
                    survivors,
                    dedup_index_path,
                    mode=dedup_index_mode,
                    text_col=text_col,
                    shingle_k=shingle_k,
                )
            if semantic_index_path:
                from sample_keyspaces_cdc_streams_connectors_spark.llm.embedding import hash_embed
                from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import append_to_semantic_index

                append_to_semantic_index(
                    survivors.select(
                        F.col(id_col).alias("vec_id"),
                        hash_embed(
                            F.col(text_col), dims=semantic_dims
                        ).alias("embedding"),
                    ),
                    semantic_index_path,
                )
            if text_index_path:
                from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import append_to_text_index

                append_to_text_index(
                    survivors,
                    text_index_path,
                    text_col=text_col,
                    id_col=id_col,
                )
        finally:
            survivors.unpersist()

    return handle
