"""Standalone session-window state-store replay bench — the isolation
tool for attributing `session_state_events_per_sec` drift (r12, VERDICT
r11 "What's wrong #2": 90,384 ev/s in r9 → 52,130 in r11 with the
replay code byte-identical between rounds — `git diff r9..r11` over
queries/streaming.py, session.py, sources/ is empty on the replay
path, so the remaining suspects are the in-suite position and the
host).

Replicates bench.py's harness exactly — fatten ×8 under disjoint
user-id offsets, n_chunks=2, floor = 1% event subset — but runs it
ALONE on the machine, in N interleaved positions, so the in-suite
J VM/state (400+ prior queries, Python worker pool churn, parquet
cache pressure) is absent.  Comparing these standalone numbers to the
in-suite ones answers "host vs harness-state vs code":

- standalone ≈ r9's 90k  → the r11 in-suite number was contention
  (host or in-suite JVM pressure), not a code regression;
- standalone ≈ r11's 52k → something that persists across suites
  (code, Spark version state, data) got slower — dig further.

Usage: python tools/session_bench.py [positions=3] [passes=2]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    positions = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import functions as F

    from sample_keyspaces_cdc_streams_connectors_spark.queries.streaming import run_session_replay
    from sample_keyspaces_cdc_streams_connectors_spark.session import get_spark
    from sample_keyspaces_cdc_streams_connectors_spark.sources import load_table

    spark = get_spark("session_bench")
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    session_fatten = 8
    ev_cols = load_table(spark, SF_DIR, "events").select(
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
    n_sess = n_events * session_fatten

    # warmup pass (JIT/codegen/worker pool), not measured — bench.py's
    # in-suite run gets this for free from the 400+ preceding queries
    run_session_replay(spark, ev_floor, n_chunks=2)

    print(f"n_events={n_events} fattened={n_sess}")
    rows = []
    for pos in range(positions):
        full = floor = float("inf")
        for _ in range(passes):
            t0 = time.time()
            run_session_replay(spark, ev_fat, n_chunks=2)
            full = min(full, time.time() - t0)
        for _ in range(passes):
            t0 = time.time()
            run_session_replay(spark, ev_floor, n_chunks=2)
            floor = min(floor, time.time() - t0)
        raw = int(n_sess / full)
        corrected = int(n_sess / max(full - floor, 1e-6))
        rows.append((pos, full, floor, raw, corrected))
        print(
            f"pos={pos} full={full:.3f}s floor={floor:.3f}s "
            f"raw={raw} ev/s corrected={corrected} ev/s"
        )
    best = max(r[4] for r in rows)
    worst = min(r[4] for r in rows)
    print(
        f"corrected spread: best={best} worst={worst} "
        f"({(best - worst) / best:.1%} positional divergence)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
