"""Per-query isolation harness: split wall time into DataFrame
construction, Catalyst analysis+optimization+physical planning, and
execution (noop sink), min over N interleaved passes.

Usage: python tools/query_bench.py [passes] [query ...]
  (default 3 passes, all bench HEADLINE queries)

The headline bench times construction+planning+execution as one number
(the honest end-to-end cost); this harness attributes WHERE the time
goes so optimization targets the right layer (guide §1.1: empirical
loop).  Planning is forced via queryExecution().executedPlan() —
driver-side only, no job; execution then re-plans from a fresh
DataFrame so the measured execution number still includes planning
(matching the bench methodology), and the "plan" column is how much of
it is attributable to the driver.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = sys.argv[2:]

    import __spark_entry__ as entrymod
    from bench import HEADLINE

    from sample_keyspaces_cdc_streams_connectors_spark.session import get_spark

    spark = get_spark("query-bench")
    queries = entrymod.queries()
    names = only or HEADLINE

    # same warmup as bench.py
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(100).select(_warm("id")).write.mode("overwrite").format(
        "noop"
    ).save()

    build: dict[str, list[float]] = {n: [] for n in names}
    plan: dict[str, list[float]] = {n: [] for n in names}
    total: dict[str, list[float]] = {n: [] for n in names}
    for _p in range(passes):
        for name in names:
            t0 = time.time()
            df = queries[name](spark, SF_DIR)
            t1 = time.time()
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            # fresh frame so execution pays planning again (bench parity)
            df2 = queries[name](spark, SF_DIR)
            t3 = time.time()
            df2.write.mode("overwrite").format("noop").save()
            t4 = time.time()
            build[name].append(t1 - t0)
            plan[name].append(t2 - t1)
            total[name].append((t3 - t2) + (t4 - t3))
    print(f"{'query':28s} {'build':>7s} {'plan':>7s} {'total':>7s} {'exec-ish':>8s}")
    tb = tp = tt = 0.0
    for name in names:
        b, p, t = min(build[name]), min(plan[name]), min(total[name])
        tb += b
        tp += p
        tt += t
        print(f"{name:28s} {b:7.3f} {p:7.3f} {t:7.3f} {t - b - p:8.3f}")
    print(f"{'SUM':28s} {tb:7.3f} {tp:7.3f} {tt:7.3f} {tt - tb - tp:8.3f}")


if __name__ == "__main__":
    main()
