"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced through the noop sink (full execution, no
driver materialization cost) and timed individually after a small
JVM/codegen warmup.  The set covers one representative per operator
category (SURVEY §2): CDC pipeline, scan, join, agg, window, top-k,
MV apply, streaming window, text analysis, MinHash dedup, vector
top-k, embedding UDF.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline subset of __spark_entry__.queries() — excludes only the
#: real-streaming-execution queries (state-store micro-batch replay
#: measures the state store, not query throughput; their rate is
#: reported separately as streaming_events_per_sec)
HEADLINE = [
    "project_enrich",        # full CDC shape pipeline (+image_shape, r5)
    "filter_jexl",           # 3-arm predicate surface (r5 consolidation)
    "scan_cast_project",
    "scan_format_roundtrip",  # csv + avro arms (r5 consolidation)
    "join_basic",            # inner-chain + left-agg arms (late r5)
    "asof_join_purchase",
    "range_join_shipments",
    "revenue_topk",
    "agg_sums",              # q1 + salted arms (r7 merge)
    "agg_cube",              # + rollup_time arm (r5 consolidation)
    "window_rank",           # + window_distribution cols (r5)
    "pivot_op_counts",
    "set_union_except",
    "scalar_funcs",
    "json_roundtrip",
    "batch_bounds",
    "time_partition_counts",
    "mv_apply",
    "text_analysis",         # + simhash col (r5 consolidation)
    "cap_per_source",
    "shard_corpus",          # distributed prefix-sum sharding (r5)
    "pack_chunks",           # exact fixed-length packing (r7)
    "dedup_ngram",
    "dedup_minhash",
    "dedup_embedding",
    "text_winnow",
    "vector_topk",           # brute + lsh + pq arms (r5 consolidation)
    "ann_ivf_topk",
    "dedup_semantic",        # SemDeDup gate (late r5)
    "lm_fluency",            # Stupid-Backoff LM gate (late r5)
    "embed_dims",
    "multimodal_geom",       # + frame sampling (r5 consolidation)
    "udaf_grouped_sum",      # + HLL sketch arm (r5 consolidation)
    "subquery_ops",          # exists/anti + scalar-avg arms (r7 merge)
    "agg_percentiles",
    "explode_wordcount",
    "mixture_split",         # corpus mixture + train/val/test split (r7)
    "bm25_rank",             # BM25 index build + pruned top-k (r7)
]

#: prior-round query names → current consolidated names, so
#: cross-round deltas stay comparable after registry consolidations.
#: When SEVERAL prior queries merged into one, their prior times are
#: SUMMED as the baseline (the merged query does all their work).
RENAMES = {
    # r1 → r2
    "metadata_enrich": "project_enrich",
    "scan_project": "scan_cast_project",
    "agg_distinct": "agg_percentiles",
    "window_moving_sum": "window_rank",
    "topk_orders": "revenue_topk",
    "stream_tumbling_counts": "stream_window_counts",
    "sessionize": "session_window_agg",
    "text_tokens": "text_analysis",
    "text_quality": "text_analysis",
    "multimodal_extract": "multimodal_geom",
    "exists_subquery": "exists_semi_anti",
    # r4 → r5 (registry consolidation back under the 50-row window)
    "scan_csv_roundtrip": "scan_format_roundtrip",
    "scan_avro_roundtrip": "scan_format_roundtrip",
    "rollup_time": "agg_cube",
    "window_distribution": "window_rank",
    "agg_approx_distinct": "udaf_grouped_sum",
    "dedup_simhash": "text_analysis",
    "multimodal_frames": "multimodal_geom",
    "ann_lsh_topk": "vector_topk",
    "filter_semantics": "filter_jexl",
    "decimal_compare": "filter_jexl",
    "image_shape": "project_enrich",
    # late r5 (slots freed for the dedup_semantic / lm_fluency gates)
    "join_inner": "join_basic",
    "join_left": "join_basic",
    "ann_pq_topk": "vector_topk",
    # r7 (slots freed for the mixture_split + bm25_rank + pack_chunks
    # gates).  dedup_exact merged into dedup_exact_cluster, which is
    # NOT benched (the cluster arm's iterative closure was
    # deliberately outside the headline before the merge too) — the
    # exact arm's cost is represented by dedup_ngram's fingerprint
    # family; the retired ~0.3 s simply leaves the headline.
    "exists_semi_anti": "subquery_ops",
    "scalar_subquery_avg": "subquery_ops",
    "agg_sum_by_key": "agg_sums",
    "agg_salted_sum": "agg_sums",
}


def _prev_bench() -> tuple[int, dict] | None:
    """Latest USABLE BENCH_r{N}.json next to this file, for round
    deltas.  Artifacts with no recoverable per-query timings (e.g.
    the r10 record, where bench crashed before emission: rc:1,
    parsed:null, tail = a traceback) are skipped, falling back to the
    newest round that actually measured — otherwise one broken round
    would erase the delta chain for the next round too."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    rounds: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    for n, path in sorted(rounds, reverse=True):
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        # the driver wraps bench stdout under "parsed"
        if isinstance(doc.get("parsed"), dict):
            doc = doc["parsed"]
        elif "queries" not in doc and isinstance(doc.get("tail"), str):
            # round-3 artifact: the one-line JSON outran the
            # driver's tail window (parsed:null) — recover the
            # per-query times from the truncated tail text
            # only the region BEFORE delta_vs_prev_sec holds raw
            # timings (the delta section reuses the same keys)
            tail = doc["tail"].split('"delta_vs_prev_sec"')[0]
            q = {
                m.group(1): float(m.group(2))
                for m in re.finditer(
                    r'"([a-z0-9_]+)":\s*([0-9.]+)', tail
                )
                if m.group(1) in HEADLINE
            }
            doc = {"queries": q, "value": None}
        if doc.get("queries"):
            return (n, doc)
    return None


@dataclasses.dataclass
class BenchResults:
    """Every measurement the emission step consumes, in one typed
    object.  The r10 bench crashed at REPORT time (a NameError on a
    variable renamed by that round's refactor) after the entire
    ~25-minute suite had executed, losing all results; assembling the
    reports through :func:`assemble_reports` — a pure function over
    this dataclass, unit-tested without Spark in
    tests/test_bench_emission.py — makes that failure mode a red test
    instead of a lost round."""

    timings: dict  # headline per-query best seconds (rounded)
    sf: float | None
    cdc_rows_per_sec: int | None
    cdc_marginal_rows_per_sec: int | None
    corpus_docs_per_sec: int | None
    streaming_events_per_sec: int
    streaming_pipelines: dict
    session_state_events_per_sec: int
    # per-position corrected session rates (r13: headline = their
    # mean; both ride in the headline artifact for re-derivation)
    session_state_rate_early: int
    session_state_rate_late: int
    stream_passes: int
    aux_ops_sec: dict
    # r13 (VERDICT r12 #7): BOTH pass times per aux op — positional
    # attribution for the aux group from the artifact alone
    aux_ops_passes_sec: dict
    # positional (pre-suite vs post-suite) bests for drift attribution
    corpus_early_best: float
    corpus_late_best: float
    cdc_early_best: float
    cdc_late_best: float
    cdc_fat8_best: float
    # session replay full/floor pairs, derived WITHIN each position
    sess_full_early: float
    sess_floor_early: float
    sess_full_late: float
    sess_floor_late: float
    session_fatten: int
    # r14 (VERDICT r13 #2): the sliding-window state-store replay gets
    # the same positional split every other group has — per-position
    # bests + EVERY raw pass time, so a driver drift like the r13
    # 47.9k→40.8k is attributable from the artifact alone
    sliding_early_best: float
    sliding_late_best: float
    streaming_passes_sec: dict
    bpe_fertility_ratio: float | None
    # per-query positional bests over the 4 interleaved suite passes
    # (passes 0-1 = early, 2-3 = late) + per-pass suite totals
    headline_early: dict
    headline_late: dict
    headline_pass_totals: list
    prev: tuple | None = None  # (round N, parsed doc) from _prev_bench


def assemble_reports(r: BenchResults) -> tuple[dict, dict]:
    """Build the (headline ``out``, bulky ``detail``) report dicts.

    Pure: no I/O, no Spark — callable from a unit test with synthetic
    numbers.  The LAST stdout line is ``out`` (compact, the driver
    parses the tail of stdout and round 3 proved a single fat line
    outruns its window); ``detail`` goes to BENCH_DETAIL.json and an
    earlier stdout line."""
    total = round(sum(r.timings.values()), 3)
    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": r.timings,
        "sf": r.sf,
        "cdc_rows_per_sec": r.cdc_rows_per_sec,
        # fixed-cost-differenced per-event rate (r9; see SCALE.md) —
        # the regression-watchable CDC number
        "cdc_marginal_rows_per_sec": r.cdc_marginal_rows_per_sec,
        "corpus_docs_per_sec": r.corpus_docs_per_sec,
        "streaming_events_per_sec": r.streaming_events_per_sec,
        # min across the two replayed state-store pipelines; breakdown:
        "streaming_pipelines": r.streaming_pipelines,
        # harness-cost-corrected session rate: events / (full replay −
        # trigger floor), per-position; r13 (ADVICE r12): headline =
        # MEAN of the two positions (central estimate over a ~±12%
        # noisy subtraction — max amplified the high tail), with both
        # per-position rates right here so either convention can be
        # recomputed from the headline artifact alone
        "session_state_events_per_sec": r.session_state_events_per_sec,
        "session_state_rate_early": r.session_state_rate_early,
        "session_state_rate_late": r.session_state_rate_late,
        # throughputs derive from the min-time over interleaved passes
        # (same minima methodology as the query suite), N recorded:
        "cdc_passes": 4,
        "corpus_passes": 5,
        "streaming_passes": r.stream_passes,
    }
    detail = {
        "aux_ops_sec": r.aux_ops_sec,
        "aux_passes": 2,
        # r13: per-op pass times — diverging passes = contention
        # burst, both moving = code (the r12 ingest_loop drift was
        # unattributable because only the min survived)
        "aux_ops_passes_sec": r.aux_ops_passes_sec,
        # corpus drift attribution (r8): per-position bests of the 5
        # corpus passes — together they separate code regressions
        # (both move) from position/host effects (they diverge)
        "corpus_early_best_sec": round(r.corpus_early_best, 3),
        "corpus_late_best_sec": round(r.corpus_late_best, 3),
        # CDC drift attribution (r9): same positional split for the
        # CDC stack — pre-suite vs post-suite bests
        "cdc_early_best_sec": round(r.cdc_early_best, 3),
        "cdc_late_best_sec": round(r.cdc_late_best, 3),
        "cdc_fat8_best_sec": round(r.cdc_fat8_best, 3),
        # session harness-cost split (r8; r9 fattens the replay ×8 so
        # state work dominates the subtraction; r10 runs the full/floor
        # pair at BOTH positions): full 2-chunk replay vs the
        # ~1%-events trigger floor, per position + the cross-position
        # minima kept for round-over-round comparability
        "session_full_early_sec": round(r.sess_full_early, 3),
        "session_floor_early_sec": round(r.sess_floor_early, 3),
        "session_full_late_sec": round(r.sess_full_late, 3),
        "session_floor_late_sec": round(r.sess_floor_late, 3),
        "session_full_sec": round(
            min(r.sess_full_early, r.sess_full_late), 3
        ),
        "session_trigger_floor_sec": round(
            min(r.sess_floor_early, r.sess_floor_late), 3
        ),
        "session_fatten": r.session_fatten,
        # streaming drift attribution (r14 — VERDICT r13 #2): the
        # sliding-window replay's per-position bests + every raw pass
        # time for BOTH state-store pipelines (diverging positions or
        # passes = contention burst; all moving together = code)
        "sliding_early_best_sec": round(r.sliding_early_best, 3),
        "sliding_late_best_sec": round(r.sliding_late_best, 3),
        "streaming_passes_sec": r.streaming_passes_sec,
        # per-QUERY positional bests (r11 — VERDICT r9 #4 / r10 #3):
        # passes 0-1 vs 2-3 of the interleaved suite; a host burst
        # inflates one position of some queries (positions diverge), a
        # code regression moves both positions together
        "headline_early_best_sec": r.headline_early,
        "headline_late_best_sec": r.headline_late,
        "headline_pass_totals_sec": r.headline_pass_totals,
        # BPE fertility at this corpus (r9): trained-BPE tokens per
        # whitespace token — the budget rescale factor for packing
        "bpe_fertility_ratio": r.bpe_fertility_ratio,
    }
    if r.prev is not None:
        n, prev_doc = r.prev
        # map prior names through the consolidation renames, SUMMING
        # when several prior queries merged into one (the merged query
        # does all their work, so the fair baseline is the sum)
        prev_q: dict = {}
        for k, v in (prev_doc.get("queries") or {}).items():
            if not isinstance(v, (int, float)):
                continue
            tgt = RENAMES.get(k, k)
            prev_q[tgt] = round(prev_q.get(tgt, 0.0) + v, 3)
        deltas = {
            name: round(t - prev_q[name], 3)
            for name, t in r.timings.items()
            if name in prev_q
        }
        detail["prev_round"] = n
        detail["prev_total_sec"] = prev_doc.get("value")
        detail["prev_queries_sec"] = prev_q
        detail["delta_vs_prev_sec"] = deltas
        # every shared query must carry a delta (VERDICT r4 nit #1):
        # record coverage explicitly so a gap is visible, not silent
        detail["delta_coverage"] = {
            "shared": len(deltas),
            "current_total": len(r.timings),
            "current_only": sorted(set(r.timings) - set(prev_q)),
        }
    return out, detail


def main() -> None:
    import __spark_entry__ as entrymod

    from sample_keyspaces_cdc_streams_connectors_spark.session import get_spark

    spark = get_spark("bench")
    queries = entrymod.queries()

    # warmup: JVM, codegen, parquet footer caches, and the Python UDF
    # worker pool + Arrow channel (one-time process spawns that would
    # otherwise be billed to the first pandas-UDF query)
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(100).select(_warm("id")).write.mode("overwrite").format(
        "noop"
    ).save()

    sf_match = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(sf_match.group(1).rstrip(".")) if sf_match else None

    # corpus-curation throughput, EARLY position (r8 — VERDICT r7 #4:
    # the r7 8,304→6,831 docs/s drift was unattributed; splitting the
    # 5 passes across two time positions — 2 here before the headline
    # suite, 3 at the historical in-suite position — separates
    # code-level regression (both positions move together) from
    # in-suite interference/host burst (positions diverge))
    from sample_keyspaces_cdc_streams_connectors_spark.config import load_config
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_corpus_pipeline

    curate = build_corpus_pipeline(
        load_config(
            {
                "keyspaces-cdc-streams": {
                    "corpus": {"scrub-pii": "true", "dedup": "exact"}
                }
            }
        )
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    n_docs = docs.count()
    corpus_early_best = float("inf")
    for _ in range(2):
        t0 = time.time()
        curate(docs).write.mode("overwrite").format("noop").save()
        corpus_early_best = min(corpus_early_best, time.time() - t0)

    # CDC pipeline throughput, EARLY position (r9 — VERDICT r8 #2: the
    # driver-recorded 255k→180k swing was unattributed; the CDC stack
    # gets the same positional split the corpus pipeline got in r8 —
    # 2 passes here before the headline suite, 2 at the historical
    # post-suite position; diverging positions = harness/host effect,
    # co-moving positions = code regression)
    from sample_keyspaces_cdc_streams_connectors_spark.envelope import synthesize_cdc
    from sample_keyspaces_cdc_streams_connectors_spark.operators import classify_operation
    from sample_keyspaces_cdc_streams_connectors_spark.operators.projection import (
        project_fields,
        shape_output,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.sources import load_table as _load_table

    def _cdc_pass() -> float:
        t0 = time.time()
        (
            shape_output(
                project_fields(
                    classify_operation(
                        synthesize_cdc(_load_table(spark, SF_DIR, "events"))
                    ),
                    ["user_id", "value"],
                ),
                record_format="default",
                include_metadata=True,
            )
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        return time.time() - t0

    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    cdc_early_best = min(_cdc_pass() for _ in range(2))

    # session-window replay, EARLY position (r10 — VERDICT r9 #8: the
    # driver's corrected state rate landed above the builder's band;
    # the full−floor subtraction is host-sensitive, so BOTH replay
    # measurements now run at both time positions, like CDC/corpus —
    # per-position full/floor pairs let the rate be derived within
    # one position instead of mixing windows)
    from sample_keyspaces_cdc_streams_connectors_spark.queries.streaming import run_session_replay

    session_fatten = 8
    ev_cols = _load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id"
    )
    ev_fat = ev_cols
    for i in range(1, session_fatten):
        off = i * 1_000_000_000
        ev_fat = ev_fat.unionByName(
            ev_cols.select(
                (F.col("user_id") + off).alias("user_id"),
                "ts",
                (F.col("event_id") + off).alias("event_id"),
            )
        )
    ev_floor = ev_cols.filter(F.col("event_id") % 100 == 0)

    # r14 (VERDICT r13 #2): EVERY raw streaming pass time is kept for
    # BENCH_DETAIL — the streaming group was the last one without
    # positional attribution data
    streaming_passes_sec: dict[str, list[float]] = {}

    def _session_pair(position: str, n_passes: int) -> tuple[float, float]:
        fulls, floors = [], []
        for _ in range(n_passes):
            t0 = time.time()
            run_session_replay(spark, ev_fat, n_chunks=2)
            fulls.append(round(time.time() - t0, 3))
        for _ in range(n_passes):
            t0 = time.time()
            run_session_replay(spark, ev_floor, n_chunks=2)
            floors.append(round(time.time() - t0, 3))
        streaming_passes_sec[f"session_full_{position}"] = fulls
        streaming_passes_sec[f"session_floor_{position}"] = floors
        return min(fulls), min(floors)

    def _sliding_passes(position: str, n_passes: int) -> float:
        times = []
        for _ in range(n_passes):
            t0 = time.time()
            df = queries["stream_window_counts"](spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
        streaming_passes_sec[f"sliding_window_{position}"] = times
        return min(times)

    sess_full_early, sess_floor_early = _session_pair("early", 2)

    # sliding-window replay, EARLY position (r14 — VERDICT r13 #2:
    # the 47.9k→40.8k driver drop sat on provably untouched code with
    # no positional data to attribute it; the replay now runs 2
    # passes here + 2 at the historical post-suite position, same
    # split as CDC/corpus/session)
    sliding_early_best = _sliding_passes("early", 2)

    # min of 4 INTERLEAVED passes per query: the first executions of a
    # query shape pay whole-stage-codegen JIT compilation, and host
    # contention is bursty on minute scales (a 0.4s-steady-state query
    # has measured 15-36s on a cold noisy run; round-4 measured
    # back-to-back full-suite totals swinging 32-37s with an idle
    # process table — the noise is the shared microVM host).  Running
    # the whole suite four times and taking the per-query minimum
    # samples each query in four separate time windows, so a
    # contention burst inflates at most one of them; back-to-back
    # trials would put all of a query's samples inside the same
    # burst.  Queries still > 2s after the passes get one extra
    # back-to-back trial.
    # r10 (VERDICT r9 #4): per-query PER-PASS times are kept so the
    # round-over-round delta can be attributed per query — the four
    # interleaved passes are four separate time windows, so a host
    # burst inflates SOME passes of SOME queries (early/late bests
    # diverge) while a code regression moves every pass together
    # (both positional bests shift) — the same positional-split
    # treatment the CDC and corpus throughputs already have.
    pass_times: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _pass in range(4):
        for name in HEADLINE:
            t0 = time.time()
            df = queries[name](spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            pass_times[name].append(time.time() - t0)
    timings = {name: min(ts) for name, ts in pass_times.items()}
    headline_early = {
        name: round(min(ts[:2]), 3) for name, ts in pass_times.items()
    }
    headline_late = {
        name: round(min(ts[2:]), 3) for name, ts in pass_times.items()
    }
    headline_pass_totals = [
        round(sum(pass_times[name][p] for name in HEADLINE), 3)
        for p in range(4)
    ]
    for name, best in timings.items():
        if best > 2.0:
            t0 = time.time()
            df = queries[name](spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            timings[name] = min(best, time.time() - t0)
    timings = {name: round(t, 3) for name, t in timings.items()}

    # CDC pipeline throughput, in-suite position: events/sec through
    # the envelope → classify → project → default-shape → enrich stack
    # (the reference's whole per-record path; its SQS sink documents
    # ~300 msg/s per queue — sqs-connector/README.md:225).  Timed as a
    # DEDICATED pipeline rather than off a registry query: the r5
    # registry consolidation folded the full-flatten image_shape arm
    # into project_enrich, which would silently deflate a
    # query-derived rate round-over-round (r4 compared 167k from the
    # leaner r4 query to ~135k from the fatter r5 one).  This stack is
    # the r4-equivalent shape and stays stable across registry
    # reshuffles.  2 passes here + 2 early = min-of-4 overall; the
    # per-position bests go to BENCH_DETAIL for drift attribution (r9).
    cdc_late_best = min(_cdc_pass() for _ in range(2))
    cdc_best = min(cdc_early_best, cdc_late_best)
    cdc_rows_per_sec = int(n_events / cdc_best) if cdc_best > 0 else None

    # CDC MARGINAL rate (r9 root cause of the r8 255k→180k swing,
    # SCALE.md): at sf0.1 the 1× run is ~0.5s of which ~80% is fixed
    # job cost (floor experiment: a 1%-events run takes 0.42s of the
    # 0.52s full), so the raw rate is jitter in a fixed-cost-dominated
    # subsecond wall.  The marginal rate divides the EXTRA events of
    # an 8×-fattened run (disjoint id offsets, same plan) by the EXTRA
    # time — per-event cost with the fixed cost differenced out, and
    # the subtraction is stable because the fat run's state is ~7× the
    # floor.  cdc_rows_per_sec stays for cross-round comparability.
    ev_base = _load_table(spark, SF_DIR, "events")
    ev_cdc_fat = ev_base
    for i in range(1, 8):
        off = i * 1_000_000_000
        ev_cdc_fat = ev_cdc_fat.unionByName(
            ev_base.withColumn(
                "event_id", F.col("event_id") + off
            ).withColumn("user_id", F.col("user_id") + off)
        )

    def _cdc_fat_pass() -> float:
        t0 = time.time()
        (
            shape_output(
                project_fields(
                    classify_operation(synthesize_cdc(ev_cdc_fat)),
                    ["user_id", "value"],
                ),
                record_format="default",
                include_metadata=True,
            )
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        return time.time() - t0

    cdc_fat8_best = min(_cdc_fat_pass() for _ in range(3))
    cdc_marginal = (
        int(7 * n_events / max(cdc_fat8_best - cdc_best, 1e-6))
        if cdc_fat8_best > cdc_best
        else None
    )

    # corpus-curation throughput, in-suite position: docs/sec through
    # the full annotate -> PII-scrub -> language gate -> exact-dedup
    # stack (the training-data-pipeline headline path).  3 passes
    # here + the 2 early passes above = min-of-5; the headline rate
    # takes the min across BOTH positions, the per-position bests go
    # to BENCH_DETAIL for drift attribution (r8).
    corpus_late_best = float("inf")
    for _ in range(3):
        t0 = time.time()
        curate(docs).write.mode("overwrite").format("noop").save()
        corpus_late_best = min(corpus_late_best, time.time() - t0)
    curate_best = min(corpus_early_best, corpus_late_best)
    corpus_docs_per_sec = int(n_docs / curate_best) if curate_best else None

    # streaming throughput: events/sec through the REAL state-store
    # pipelines (readStream availableNow replay, update mode,
    # foreachBatch capture).  TWO distinct state shapes are replayed —
    # the sliding-window aggregate (HDFSBackedStateStore keyed windows)
    # and the session-window aggregate (merging session state) — so a
    # regression in EITHER store path is visible round-over-round
    # (VERDICT r4 #6 + r5 #7: one pipeline left session/join/dedup
    # state invisible).  The headline streaming_events_per_sec is the
    # MIN of the per-pipeline rates (conservative: the slowest state
    # machinery bounds a mixed workload); the per-pipeline breakdown
    # is reported alongside.  Min-elapsed over N passes each, same
    # minima methodology as the suite.
    # r14: 2 passes here (LATE position) + the 2 early ones above =
    # min-of-4 across two time windows, the same convention as the
    # CDC/corpus throughputs; per-position bests + raw pass times go
    # to BENCH_DETAIL for drift attribution
    stream_passes = 4
    streaming_pipelines: dict[str, int] = {}
    sliding_late_best = _sliding_passes("late", 2)
    best = min(sliding_early_best, sliding_late_best)
    streaming_pipelines["sliding_window"] = int(n_events / best)

    # session-window replay, restructured for MEASUREMENT (r8 —
    # VERDICT r7 #3): the 3-chunk gate shape spends most of its time
    # in per-trigger fixed cost (fixture write + 4 micro-batch
    # spin-ups for ~60k events), so its rate measured the harness,
    # not the state machinery.  Bench drives the SAME replay with 2
    # fat chunks (cross-batch session merging still exercised; append
    # output is chunk-shape invariant) AND measures the trigger FLOOR
    # — an identical 2-chunk+sentinel replay over ~1% of the events,
    # i.e. the same number of triggers with negligible state work.
    # session_window = raw end-to-end rate; session_window_state =
    # events / (full − floor), the harness-cost-corrected state rate.
    # r9 (VERDICT r8 #6): at sf0.1 the trigger floor was 78% of the
    # full replay, so the corrected rate was a small difference of
    # large numbers (driver 44k vs builder 70k/54k).  The replay is
    # FATTENED ×8 by unioning the events under disjoint user-id
    # offsets — same trigger count and chunk structure, 8× the
    # sessions and state rows per trigger — pushing state work to a
    # majority of wall time so the subtraction is stable.  r10
    # (VERDICT r9 #8): LATE-position pair here; the corrected rate is
    # derived WITHIN each position (early pair above, late pair here)
    # and the headline takes the conservative minimum — full and
    # floor from different time windows never mix.
    sess_full_late, sess_floor_late = _session_pair("late", 2)
    sess_best = min(sess_full_early, sess_full_late)
    n_sess_events = n_events * session_fatten
    streaming_pipelines["session_window"] = int(n_sess_events / sess_best)
    session_rate_early = int(
        n_sess_events / max(sess_full_early - sess_floor_early, 1e-6)
    )
    session_rate_late = int(
        n_sess_events / max(sess_full_late - sess_floor_late, 1e-6)
    )
    # r12 (VERDICT r11 wrong #2) took the BEST position; r13 (ADVICE
    # r12): with the ~±12%/21% positional spread the isolation study
    # measured (tools/session_bench.py), max-over-positions
    # systematically reports the HIGH tail of a noisy subtraction —
    # unlike the other metrics' min-time, which suppresses noise over
    # repeats of the SAME measurement.  The headline is now the MEAN
    # of the two positions (the central estimate; with two samples
    # mean == median) and BOTH per-position rates ride in the headline
    # artifact itself, not only in detail, so any round can recompute
    # either convention.
    session_state_rate = (session_rate_early + session_rate_late) // 2
    streaming_events_per_sec = min(streaming_pipelines.values())

    # auxiliary operators (round-3 additions outside the oracle
    # registry): timed min-of-2 each, reported separately so they
    # never perturb the headline timings or cross-round deltas
    aux: dict[str, float] = {}

    # r13 (VERDICT r12 #7): the aux group gets the same positional
    # instrumentation every other metric has — BOTH pass times land in
    # BENCH_DETAIL (aux_ops_passes_sec), so a drift like the r12
    # ingest_loop 59.8→92.8 s is attributable from the artifact alone
    # (passes diverge → contention burst; both move → code)
    aux_passes: dict[str, list[float]] = {}

    def _aux(name: str, fn) -> None:
        # min of 2 passes, same rationale as the headline suite: the
        # first execution pays codegen JIT for these (large) column
        # programs and is exposed to contention bursts
        times = []
        for _ in range(2):
            t0 = time.time()
            fn()
            times.append(round(time.time() - t0, 3))
        aux_passes[name] = times
        aux[name] = min(times)

    import shutil
    import tempfile

    from pyspark.sql import functions as AF

    from sample_keyspaces_cdc_streams_connectors_spark.functions.repetition import repetition_filter
    from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import (
        build_dedup_index,
        dedup_against_index,
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.importance import select_like_target
    from sample_keyspaces_cdc_streams_connectors_spark.operators.layout import write_zordered
    from sample_keyspaces_cdc_streams_connectors_spark.operators.profile import profile_table

    raw_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tmpdir = tempfile.mkdtemp(prefix="bench_aux_")
    try:
        _aux(
            "repetition_filter",
            lambda: repetition_filter(docs)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        _aux("profile_table", lambda: profile_table(raw_docs).collect())
        from sample_keyspaces_cdc_streams_connectors_spark.llm.chunking import chunk_documents
        from sample_keyspaces_cdc_streams_connectors_spark.llm.decontaminate import decontaminate

        _aux(
            "chunk_documents",
            lambda: chunk_documents(docs, max_tokens=64)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        _aux(
            "decontaminate",
            lambda: decontaminate(
                docs, docs.filter(AF.col("doc_id") % 50 == 0), k=8
            )
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        from sample_keyspaces_cdc_streams_connectors_spark.llm.spans import remove_repeated_spans

        _aux(
            "remove_repeated_spans",
            lambda: remove_repeated_spans(docs, k=5, min_docs=2)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        import numpy as np

        from sample_keyspaces_cdc_streams_connectors_spark.llm.quality_model import (
            QualityModel,
            score_quality,
        )

        qm = QualityModel(
            weights=np.arange(1 << 16, dtype=np.float64) % 997 / 997.0 - 0.5,
            bias=0.1,
            n_buckets=1 << 16,
        )
        _aux(
            "quality_score",
            lambda: score_quality(docs, qm)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        _aux(
            "dsir_select",
            lambda: select_like_target(
                docs,
                docs.filter(AF.col("doc_id") % 50 == 0),
                k=200,
                n_buckets=1 << 16,
            )
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        _aux(
            "zorder_write_events",
            lambda: write_zordered(
                spark.read.parquet(f"{SF_DIR}/events.parquet").select(
                    "event_id", "user_id", "value"
                ),
                f"{tmpdir}/z",
                ["user_id", "value"],
                n_files=32,
                bits=6,
            ),
        )
        build_dedup_index(docs, f"{tmpdir}/idx", mode="exact")
        _aux(
            "dedup_index_probe",
            lambda: dedup_against_index(docs, f"{tmpdir}/idx", mode="exact")
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        # Bloom prefilter pair: the representative INGEST scenario is a
        # mostly-fresh batch against a standing index (not the all-dup
        # self-probe above) — index 10% of the corpus, probe all of it,
        # so ~90% of keys can be ruled out map-only.
        from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup_index import build_index_bloom

        build_dedup_index(
            docs.filter(AF.col("doc_id") % 10 == 0),
            f"{tmpdir}/idx10",
            mode="exact",
        )
        idx_bloom = build_index_bloom(spark, f"{tmpdir}/idx10", mode="exact")
        _aux(
            "ingest_probe_plain",
            lambda: dedup_against_index(docs, f"{tmpdir}/idx10", mode="exact")
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        _aux(
            "ingest_probe_bloom",
            lambda: dedup_against_index(
                docs, f"{tmpdir}/idx10", mode="exact", bloom=idx_bloom
            )
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        from sample_keyspaces_cdc_streams_connectors_spark.llm.kmeans import kmeans_fit
        from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import semantic_dedup

        # steady-state SemDeDup: the codebook trains ONCE per corpus
        # snapshot and is reused across batches (the documented
        # production posture — stable cluster ids), so the timed path
        # is assign + per-cluster scoring + survivor join, not Lloyd's.
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        sem_codebook = kmeans_fit(emb, k=8, n_iter=3)
        _aux(
            "semantic_dedup",
            lambda: semantic_dedup(emb, eps=0.9, centroids=sem_codebook)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        # cross-corpus / streaming-ingest semantic probe (late r5):
        # index built once from the corpus, the timed path is
        # broadcast-codebook assignment + the cell-keyed anti-join
        from sample_keyspaces_cdc_streams_connectors_spark.llm.semdedup import (
            semantic_dedup_against_index,
            write_semantic_index,
        )

        write_semantic_index(
            emb, f"{tmpdir}/semidx", centroids=sem_codebook
        )
        _aux(
            "semantic_index_probe",
            lambda: semantic_dedup_against_index(
                emb, f"{tmpdir}/semidx", eps=0.9
            )
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        # BM25 lexical retrieval (late r5): index built once, the
        # timed path is the pruned posting scan + heap top-k.
        # r9: built as 90% + a timed 10% append + a timed compaction
        # (the standing-index maintenance loop), so ingest and
        # compaction costs are regression-watchable; the final index
        # holds the full corpus either way, keeping bm25_topk
        # comparable.  Single-pass times (an append is not
        # repeatable — ids must be new; the second compact would be
        # a no-op).
        from sample_keyspaces_cdc_streams_connectors_spark.llm.maintenance import compact_text_index
        from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import (
            append_to_text_index,
            bm25_topk,
            write_text_index,
        )

        write_text_index(
            raw_docs.filter(AF.col("doc_id") % 10 != 0), f"{tmpdir}/bm25"
        )
        t0 = time.time()
        append_to_text_index(
            raw_docs.filter(AF.col("doc_id") % 10 == 0), f"{tmpdir}/bm25"
        )
        aux["text_index_append_10pct"] = round(time.time() - t0, 3)
        t0 = time.time()
        compact_text_index(spark, f"{tmpdir}/bm25")
        aux["text_index_compact"] = round(time.time() - t0, 3)
        _aux(
            "bm25_topk",
            lambda: bm25_topk(
                spark, f"{tmpdir}/bm25", "the quick brown data pipeline"
            )
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        # bulk BM25 (r6/r7 — the scale story: a query TABLE scored in
        # one pass; only the single-query path was timed before r8)
        from sample_keyspaces_cdc_streams_connectors_spark.llm.retrieval import bm25_topk_many

        qtable = spark.createDataFrame(
            [
                (i, f"data stream window batch join q{i}")
                for i in range(64)
            ],
            "query_id long, query string",
        )
        _aux(
            "bm25_topk_many_64q",
            lambda: bm25_topk_many(spark, f"{tmpdir}/bm25", qtable, k=10)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        # int8 quantized search (r7 op, r8 aux): production narrow
        # layout persisted once; timed paths are the 1-byte/dim scan
        # top-k, approx-only and with exact re-rank
        from sample_keyspaces_cdc_streams_connectors_spark.llm.quant import quantize_embeddings, quantized_topk

        quantize_embeddings(emb).drop("embedding").write.parquet(
            f"{tmpdir}/qtab"
        )
        qtab = spark.read.parquet(f"{tmpdir}/qtab")
        bench_qvec = [float(x) for x in emb.first()["embedding"]]
        _aux(
            "quantized_topk_approx",
            lambda: quantized_topk(qtab, bench_qvec, k=10)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        # bulk dense retrieval (r9): 64 query vectors answered in ONE
        # pass — the dense mirror of bm25_topk_many_64q; brute over
        # the raw table, and the union-cell-pruned bulk IVF probe
        from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (
            ivf_index_topk_many,
            write_ivf_index,
        )
        from sample_keyspaces_cdc_streams_connectors_spark.llm.similarity import brute_force_topk_many

        vq = emb.limit(64).select(
            AF.col("vec_id").alias("query_id"), "embedding"
        )
        _aux(
            "vector_topk_many_64q",
            lambda: brute_force_topk_many(emb, vq, k=10)
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        write_ivf_index(emb, f"{tmpdir}/bulkivf", k=16)
        _aux(
            "ivf_topk_many_64q",
            lambda: ivf_index_topk_many(
                spark, f"{tmpdir}/bulkivf", vq, topk=10, n_probe=2
            )
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        from sample_keyspaces_cdc_streams_connectors_spark.llm.ivf_index import (
            ivf_int8_topk_many,
            write_ivf_int8_index,
        )

        write_ivf_int8_index(emb, f"{tmpdir}/bulki8", k=16)
        _aux(
            "ivf_int8_topk_many_64q",
            lambda: ivf_int8_topk_many(
                spark, f"{tmpdir}/bulki8", vq, topk=10, n_probe=2
            )
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        _aux(
            "quantized_topk_rerank",
            lambda: quantized_topk(
                qtab, bench_qvec, k=10, rerank_with=emb, rerank_factor=4
            )
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        # URL curation stage (r7 op, r8 aux): normalize + host +
        # eTLD+1 + subdomain-aware blocklist over synthetic messy URLs
        # — pure JVM columns + broadcast suffix anti-joins
        from sample_keyspaces_cdc_streams_connectors_spark.functions.urls import (
            filter_blocked_hosts,
            normalize_url,
            registered_domain,
            url_host,
        )

        url_docs = raw_docs.withColumn(
            "u",
            AF.concat(
                AF.lit("https://sub"),
                (AF.col("doc_id") % 1000).cast("string"),
                AF.lit(".example"),
                (AF.col("doc_id") % 97).cast("string"),
                AF.lit(".com/p/"),
                AF.col("doc_id").cast("string"),
                AF.lit("?utm_source=x&id=1"),
            ),
        )
        url_blocklist = [f"example{i}.com" for i in range(0, 97, 7)]
        _aux(
            "url_curation",
            lambda: filter_blocked_hosts(url_docs, "u", url_blocklist)
            .select(
                "doc_id",
                normalize_url(AF.col("u")).alias("nu"),
                url_host(AF.col("u")).alias("h"),
                registered_domain(AF.col("u")).alias("d"),
            )
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        from sample_keyspaces_cdc_streams_connectors_spark.llm.bpe import bpe_token_count, train_bpe

        bpe_model = train_bpe(raw_docs, n_merges=200)
        _aux(
            "bpe_encode",
            lambda: raw_docs.select(
                bpe_token_count(AF.col("text"), bpe_model).alias("n")
            )
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        # BPE-counted packing (r9 — VERDICT r8 #8: counter
        # pluggability landed in r8 but no bench packed by a TRAINED
        # counter).  Same pack_chunks shape as the headline gate but
        # weighted in the model's own tokens; the fertility ratio
        # (BPE tokens per whitespace token) is what re-scales every
        # whitespace-budgeted knob at deploy.
        from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import pack_chunks as _pack_chunks
        from sample_keyspaces_cdc_streams_connectors_spark.functions.text import token_count as _ws_count

        _aux(
            "pack_chunks_bpe",
            lambda: _pack_chunks(
                raw_docs,
                512,
                counter=lambda c: bpe_token_count(c, bpe_model),
            )
            .write.mode("overwrite")
            .format("noop")
            .save(),
        )
        tok_sums = raw_docs.select(
            AF.sum(
                bpe_token_count(AF.col("text"), bpe_model).cast("long")
            ).alias("bpe"),
            AF.sum(_ws_count(AF.col("text")).cast("long")).alias("ws"),
        ).first()
        bpe_fertility = (
            round(tok_sums["bpe"] / tok_sums["ws"], 4)
            if tok_sums["ws"]
            else None
        )
        # streaming curation-ingest loop, end-to-end (r11 — VERDICT
        # r9 #6 / r10 #4): 4 micro-batches through the foreachBatch
        # sink with ALL THREE standing indexes configured and both
        # in-loop compactions firing (every=2 → batches 2 and 4), so
        # the probe → sink → append → compact path is
        # regression-watchable as one number.  r13 (VERDICT r12 #1
        # wrong / #7): TWO passes, each over a FRESH index tree
        # (appends are not repeatable within one lineage — a fresh
        # tree per pass is the only honest repeat), min reported +
        # both passes in detail, matching tools/ingest_bench.py's
        # standalone isolation methodology.
        from sample_keyspaces_cdc_streams_connectors_spark.llm.embedding import hash_embed
        from sample_keyspaces_cdc_streams_connectors_spark.streaming.ingest import curation_ingest_sink

        ing_slices = [
            raw_docs.filter(AF.col("doc_id") % 5 == i) for i in range(5)
        ]

        def _ingest_pass(root: str) -> float:
            build_dedup_index(ing_slices[0], f"{root}/ing_didx", mode="exact")
            write_text_index(ing_slices[0], f"{root}/ing_tidx")
            write_semantic_index(
                ing_slices[0].select(
                    AF.col("doc_id").alias("vec_id"),
                    hash_embed(AF.col("text"), dims=32).alias("embedding"),
                ),
                f"{root}/ing_sidx",
                k=8,
            )
            ing_cfg = load_config(
                {
                    "keyspaces-cdc-streams": {
                        "corpus": {
                            "dedup-index-path": f"{root}/ing_didx",
                            "dedup-index-compact-every": "2",
                            "text-index-path": f"{root}/ing_tidx",
                            "text-index-compact-every": "2",
                            "semantic-index-path": f"{root}/ing_sidx",
                            "semantic-dims": "32",
                        }
                    }
                }
            )
            ing_handle = curation_ingest_sink(ing_cfg, f"{root}/ing_out")
            t0 = time.time()
            for i in range(1, 5):
                ing_handle(ing_slices[i], i)
            return round(time.time() - t0, 3)

        ing_times = [
            _ingest_pass(f"{tmpdir}/ing_p{p}") for p in range(2)
        ]
        aux_passes["ingest_loop_4batch"] = ing_times
        aux["ingest_loop_4batch"] = min(ing_times)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)

    # --- emission: everything measured goes through the typed results
    # object + the PURE assembler (unit-tested without Spark — the r10
    # crash happened here, at report time, after the full suite ran).
    results = BenchResults(
        timings=timings,
        sf=sf,
        cdc_rows_per_sec=cdc_rows_per_sec,
        cdc_marginal_rows_per_sec=cdc_marginal,
        corpus_docs_per_sec=corpus_docs_per_sec,
        streaming_events_per_sec=streaming_events_per_sec,
        streaming_pipelines=streaming_pipelines,
        session_state_events_per_sec=session_state_rate,
        session_state_rate_early=session_rate_early,
        session_state_rate_late=session_rate_late,
        stream_passes=stream_passes,
        aux_ops_sec=aux,
        aux_ops_passes_sec=aux_passes,
        corpus_early_best=corpus_early_best,
        corpus_late_best=corpus_late_best,
        cdc_early_best=cdc_early_best,
        cdc_late_best=cdc_late_best,
        cdc_fat8_best=cdc_fat8_best,
        sess_full_early=sess_full_early,
        sess_floor_early=sess_floor_early,
        sess_full_late=sess_full_late,
        sess_floor_late=sess_floor_late,
        session_fatten=session_fatten,
        sliding_early_best=sliding_early_best,
        sliding_late_best=sliding_late_best,
        streaming_passes_sec=streaming_passes_sec,
        bpe_fertility_ratio=bpe_fertility,
        headline_early=headline_early,
        headline_late=headline_late,
        headline_pass_totals=headline_pass_totals,
        prev=_prev_bench(),
    )
    out, detail = assemble_reports(results)
    # the driver parses the TAIL of stdout, and round 3 proved a
    # single fat line outruns its window (BENCH_r03: parsed:null).
    # So: the LAST line is the compact headline JSON (always
    # parseable); everything bulky (aux timings, deltas, positional
    # splits) goes to BENCH_DETAIL.json on disk + an EARLIER line.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as fh:
        json.dump({**out, **detail}, fh, indent=1)
    print(json.dumps(detail))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
