"""Standalone sliding-window state-store replay bench — the isolation
tool for attributing `streaming_events_per_sec` drift (r14, VERDICT
r13 "What's wrong #1": the driver's sliding-window rate fell 51,763 →
46,262 and the session min 47,868 → 40,832 between r12 and r13 with
the replay code byte-identical — git diff over queries/streaming.py,
streaming/pipeline.py, streaming/stateful.py is empty — so the
remaining suspects are the in-suite position and the host).

Replicates bench.py's sliding-window measurement exactly — the
`stream_window_counts` registry pipeline (readStream availableNow
replay through the HDFSBackedStateStore keyed-window aggregate, noop
sink) — but runs it ALONE on the machine, in N positions of M passes,
so the in-suite JVM/state (400+ prior queries, Python worker pool
churn, parquet cache pressure) is absent.  Comparing standalone to
in-suite answers "host vs harness-state vs code":

- standalone ≈ the old round's rate → the driver number was
  contention (host burst or in-suite pressure), not code;
- standalone ≈ the new lower rate → something that persists across
  suites got slower — dig further.

The in-suite artifact now records per-position bests and every raw
pass time (BENCH_DETAIL `sliding_early/late_best_sec`,
`streaming_passes_sec`), so this tool is the second leg of the same
attribution: artifact splits localize WHEN, this tool isolates WHERE.

Usage: python tools/streaming_bench.py [positions=3] [passes=2]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    positions = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import __spark_entry__ as entrymod

    from sample_keyspaces_cdc_streams_connectors_spark.session import get_spark

    spark = get_spark("streaming_bench")
    queries = entrymod.queries()
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    def one_pass() -> float:
        t0 = time.time()
        df = queries["stream_window_counts"](spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        return time.time() - t0

    # warmup pass (JIT/codegen/worker pool), not measured — the
    # in-suite run gets this for free from the preceding queries
    one_pass()

    print(f"n_events={n_events}")
    rates = []
    for pos in range(positions):
        times = [one_pass() for _ in range(passes)]
        best = min(times)
        rate = int(n_events / best)
        rates.append(rate)
        print(
            f"pos={pos} passes={[round(t, 3) for t in times]} "
            f"best={best:.3f}s rate={rate} ev/s"
        )
    best, worst = max(rates), min(rates)
    print(
        f"rate spread: best={best} worst={worst} "
        f"({(best - worst) / best:.1%} positional divergence)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
