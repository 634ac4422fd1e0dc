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

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline subset of __spark_entry__.queries() — excludes the
#: quadratic-verification dedup_ngram (dedup_minhash is the scale path)
HEADLINE = [
    "metadata_enrich",       # full CDC shape pipeline
    "scan_project",
    "join_inner",
    "join_left",
    "asof_join_purchase",
    "range_join_shipments",
    "revenue_topk",
    "regional_revenue",
    "agg_sum_by_key",
    "agg_distinct",
    "window_rank",
    "window_moving_sum",
    "pivot_op_counts",
    "topk_orders",
    "set_union_except",
    "json_roundtrip",
    "batch_bounds",
    "mv_apply",
    "stream_tumbling_counts",
    "sessionize",
    "dedup_events",
    "text_tokens",
    "text_quality",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding",
    "text_winnow",
    "vector_topk",
    "ann_ivf_topk",
    "embed_dims",
    "multimodal_extract",
    "multimodal_frames",
    "exists_subquery",
    "scalar_subquery_avg",
    "agg_percentiles",
    "agg_approx_distinct",
    "explode_wordcount",
    "stream_interval_join",
]


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

    # min of 2 runs per query: the first execution of a query shape
    # pays whole-stage-codegen JIT compilation (measured up to 5s under
    # host contention, ~0.5s of real work); the minimum is the
    # steady-state per-query cost an engine actually delivers.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # CDC pipeline throughput: events/sec through the full envelope →
    # classify → filter → shape → enrich stack (the reference's whole
    # per-record path; its SQS sink documents ~300 msg/s per queue —
    # sqs-connector/README.md:225)
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    cdc_rows_per_sec = (
        int(n_events / timings["metadata_enrich"])
        if timings.get("metadata_enrich")
        else None
    )
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cdc_rows_per_sec": cdc_rows_per_sec,
            }
        )
    )


if __name__ == "__main__":
    main()
