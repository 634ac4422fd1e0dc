"""Standalone curation-ingest-loop bench — the isolation tool for
attributing `ingest_loop_4batch` drift (r13, VERDICT r12 "What's
wrong #1": 59.8 s measured locally in r11 → 92.8 s in the r12 driver
run, with the r12 ledger code unable to explain it — pruning fires
every 128 batches and the bench loop runs 4).

Replicates bench.py's aux harness exactly — seed a fifth of the
documents into all three standing indexes (exact dedup fingerprints,
BM25 text index, 32-dim semantic index), then drive 4 micro-batches
through ``curation_ingest_sink`` with both in-loop compactions firing
(every=2 → batches 2 and 4) — but runs it ALONE on the machine, in N
repeated positions with a FRESH tmpdir each (appends are not
repeatable inside one lineage; a fresh index tree per position is the
only honest repeat), so the in-suite JVM/state (400+ prior queries,
Python worker pool churn, parquet cache pressure) is absent.
Comparing standalone positions to the in-suite number answers "host
vs harness-state vs code" exactly like tools/session_bench.py did for
the session-state drift:

- standalone ≈ the old 59.8 s → the driver number was position/host
  contention, not a code regression;
- standalone ≈ 92.8 s        → something persistent (code, data,
  Spark state) got slower — dig further.

Usage: python tools/ingest_bench.py [positions=3]
Prints per-position seconds + min/median, JSON on the last line.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def run_position(spark, raw_docs, collect_stages: bool = False):
    from pyspark.sql import functions as F

    from sample_keyspaces_cdc_streams_connectors_spark.config import load_config
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import build_dedup_index
    from sample_keyspaces_cdc_streams_connectors_spark.llm.embedding import hash_embed
    from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import write_text_index
    from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import write_semantic_index
    from sample_keyspaces_cdc_streams_connectors_spark.streaming.ingest import curation_ingest_sink

    tmpdir = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        slices = [
            raw_docs.filter(F.col("doc_id") % 5 == i) for i in range(5)
        ]
        build_dedup_index(slices[0], f"{tmpdir}/ing_didx", mode="exact")
        write_text_index(slices[0], f"{tmpdir}/ing_tidx")
        write_semantic_index(
            slices[0].select(
                F.col("doc_id").alias("vec_id"),
                hash_embed(F.col("text"), dims=32).alias("embedding"),
            ),
            f"{tmpdir}/ing_sidx",
            k=8,
        )
        cfg = load_config(
            {
                "keyspaces-cdc-streams": {
                    "corpus": {
                        "dedup-index-path": f"{tmpdir}/ing_didx",
                        "dedup-index-compact-every": "2",
                        "text-index-path": f"{tmpdir}/ing_tidx",
                        "text-index-compact-every": "2",
                        "semantic-index-path": f"{tmpdir}/ing_sidx",
                        "semantic-dims": "32",
                    }
                }
            }
        )
        stage_times: dict | None = {} if collect_stages else None
        handle = curation_ingest_sink(
            cfg, f"{tmpdir}/ing_out", stage_times=stage_times
        )
        t0 = time.time()
        for i in range(1, 5):
            handle(slices[i], i)
        total = time.time() - t0
        if collect_stages:
            return total, stage_times
        return total, None
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--stages"]
    collect_stages = "--stages" in sys.argv[1:]
    positions = int(args[0]) if args else 3

    from sample_keyspaces_cdc_streams_connectors_spark.session import get_spark

    spark = get_spark("ingest_bench")
    raw_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    raw_docs.count()  # warm the scan
    times = []
    stage_tables = []
    for p in range(positions):
        t, stages = run_position(spark, raw_docs, collect_stages)
        times.append(round(t, 3))
        print(f"position {p}: {t:.3f}s", flush=True)
        if stages:
            stage_tables.append(stages)
            # r14 (VERDICT r13 #6): the cost table — where the loop's
            # fixed ~60 s actually goes, per stage per batch
            for name, vals in stages.items():
                print(
                    f"  {name}: total={sum(vals):.2f}s "
                    f"per-batch={vals}",
                    flush=True,
                )
    times_sorted = sorted(times)
    med = times_sorted[len(times_sorted) // 2]
    doc = {
        "metric": "ingest_loop_4batch_standalone",
        "positions_sec": times,
        "min_sec": min(times),
        "median_sec": med,
        "sf_dir": SF_DIR,
    }
    if stage_tables:
        # the best position's stage breakdown rides in the JSON line
        best = stage_tables[times.index(min(times))]
        doc["stage_totals_sec"] = {
            k: round(sum(v), 3) for k, v in best.items()
        }
        doc["stage_passes_sec"] = best
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
