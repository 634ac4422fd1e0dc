"""Interleaved A/B harness for the r15 re-measurement of the three
r14 changes the driver's PERF data contradicted (VERDICT r14 #2):

  mv        — mv_apply struct narrowing: A = narrow always (r14),
              B = pass newImage through (r13)
  dot       — dedup_embedding dot_pandas: A = asNondeterministic
              (r14), B = plain (r13)
  roundtrip — scan_format_roundtrip fixture planning: A = size-
              estimated child session (r14), B = parent session (r13)
  (the r15 ngram toggles were removed after both variants were
  rejected: postings-persist measured 2.254 vs 1.274 s min, and the
  broadcast restructure proved plan-identical — ReuseExchange already
  fired on the r14 form's canonicalized build sides)

Usage: python tools/ab_r15.py <toggle> [cycles]
Each cycle runs A then B (construction + noop execution, bench
methodology); report min/median per variant.  Interleaving makes a
host burst hit both variants equally (VERDICT r14 #10 protocol).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    toggle = sys.argv[1]
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import __spark_entry__ as entrymod

    from sample_keyspaces_cdc_streams_connectors_spark.session import get_spark

    spark = get_spark("ab-r15")
    queries = entrymod.queries()

    # warmup (bench parity)
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(100).select(_warm("id")).write.mode("overwrite").format(
        "noop"
    ).save()

    if toggle == "mv":
        from sample_keyspaces_cdc_streams_connectors_spark.operators import mv as mvmod

        qname = "mv_apply"

        def set_a() -> None:  # narrow always (r14)
            mvmod._NARROW_MIN_DROP = 0.0

        def set_b() -> None:  # never narrow (r13)
            mvmod._NARROW_MIN_DROP = 1.01
    elif toggle == "dot":
        from sample_keyspaces_cdc_streams_connectors_spark.functions import vectors as vmod

        qname = "dedup_embedding"
        orig = vmod.dot_pandas

        import pandas as pd  # noqa: F401

        def set_a() -> None:  # r14 asNondeterministic form
            vmod._DOT_NONDET = True

        def set_b() -> None:  # r13 plain form
            vmod._DOT_NONDET = False
    elif toggle == "roundtrip":
        from sample_keyspaces_cdc_streams_connectors_spark import session as sessmod

        qname = "scan_format_roundtrip"
        orig_psp = sessmod.planning_session_for_path

        def set_a() -> None:  # r14 policy
            sessmod.planning_session_for_path = orig_psp

        def set_b() -> None:  # r13: keep the caller's session
            sessmod.planning_session_for_path = lambda spark, path: spark
    elif toggle == "subq":
        # subquery_ops exists-arm: A = r14 one pre-aggregated left
        # join (the shipped form), B = r13 left_semi + left_anti pair.
        # The driver's PERF_r14 put subquery_ops in the regressed-in-
        # both-runs bucket, so the r14 rewrite needs its own recorded
        # interleaved numbers (VERDICT r14 #2/#10).
        from pyspark.sql import functions as FF

        from sample_keyspaces_cdc_streams_connectors_spark.queries.relational import (
            _dbl,
            _dec,
        )
        from sample_keyspaces_cdc_streams_connectors_spark.sources.tables import (
            load_table,
        )

        qname = "subquery_ops"
        queries = dict(queries)
        orig_subq = queries[qname]

        def _subq_r13(spark, sf_dir):  # noqa: ANN001 — harness-local
            o = load_table(spark, sf_dir, "orders").filter(
                FF.col("o_orderdate") >= FF.lit("1995-01-01").cast("timestamp")
            )
            li = load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_shipdate"
            )
            cond = (o.o_orderkey == li.l_orderkey) & (
                li.l_shipdate > o.o_orderdate
            )

            def _exists_arm(join_type, cohort):  # noqa: ANN001
                return (
                    o.join(li, cond, join_type)
                    .groupBy("o_orderpriority")
                    .agg(FF.count("*").alias("n"))
                    .select(
                        FF.lit("exists").alias("arm"),
                        FF.col("o_orderpriority").alias("key"),
                        FF.lit(cohort).alias("cohort"),
                        "n",
                        FF.lit(0.0).alias("amount"),
                    )
                )

            li2 = load_table(spark, sf_dir, "lineitem").select(
                "l_partkey", "l_quantity", "l_extendedprice"
            )
            qty_cap = li2.groupBy("l_partkey").agg(
                (FF.lit(0.5) * FF.avg("l_quantity")).alias("qty_cap")
            )
            p = load_table(spark, sf_dir, "part").select(
                "p_partkey", "p_brand"
            )
            scalar = (
                li2.join(qty_cap, "l_partkey")
                .filter(FF.col("l_quantity") < FF.col("qty_cap"))
                .join(
                    FF.broadcast(p), FF.col("l_partkey") == FF.col("p_partkey")
                )
                .groupBy("p_brand")
                .agg(
                    FF.count("*").alias("n"),
                    _dbl(FF.sum(_dec("l_extendedprice"))).alias("amount"),
                )
                .select(
                    FF.lit("scalar_avg").alias("arm"),
                    FF.col("p_brand").alias("key"),
                    FF.lit("").alias("cohort"),
                    "n",
                    "amount",
                )
            )
            return (
                _exists_arm("left_semi", "late")
                .unionAll(_exists_arm("left_anti", "clean"))
                .unionAll(scalar)
            )

        def set_a() -> None:  # r14 one-join form
            queries[qname] = orig_subq

        def set_b() -> None:  # r13 semi/anti pair
            queries[qname] = _subq_r13
    elif toggle in ("shard", "pack"):
        from sample_keyspaces_cdc_streams_connectors_spark.llm import pipeline as pmod

        qname = "shard_corpus" if toggle == "shard" else "pack_chunks"
        orig_shard, orig_pack = pmod.shard_corpus, pmod.pack_chunks

        def set_a() -> None:  # persist the bucketed 3-col projection
            pmod.shard_corpus = (
                lambda *a, **k: orig_shard(*a, **{**k, "persist": True})
            )
            pmod.pack_chunks = (
                lambda *a, **k: orig_pack(*a, **{**k, "persist": True})
            )

        def set_b() -> None:  # r14 recompute-twice form
            pmod.shard_corpus = orig_shard
            pmod.pack_chunks = orig_pack
    else:
        raise SystemExit(f"unknown toggle {toggle!r}")

    times: dict[str, list[float]] = {"A": [], "B": []}
    for c in range(cycles):
        for label, setter in (("A", set_a), ("B", set_b)):
            setter()
            spark.sparkContext.setJobDescription(
                f"ab:{toggle}:{label}:{c}"
            )
            t0 = time.time()
            df = queries[qname](spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            times[label].append(dt)
            print(f"cycle {c} {label}: {dt:.3f}s", flush=True)
    set_a()
    for label in ("A", "B"):
        ts = times[label]
        print(
            f"{label}: min {min(ts):.3f}  median "
            f"{statistics.median(ts):.3f}  all "
            f"{[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
