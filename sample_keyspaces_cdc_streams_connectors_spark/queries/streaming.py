"""Streaming-semantics correctness queries — REAL streaming in-gate.

As of round 3 all five queries here replay events through readStream
micro-batches with their state on the state store (windowed-agg
state, session-merge state, stream-stream join state, GroupState,
dedup state) and reconstruct the driver-checkable batch-equivalent
result from the stream's own emissions: update-mode final captures
via foreachBatch for the windowed aggregate, append-mode with a
watermark sentinel for session windows, emitted pairs for the
interval join.  tests/test_streaming.py additionally exercises the
watermarked late-drop paths on hand-built fixtures.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.queries import register
from sample_keyspaces_cdc_streams_connectors_spark.sources import load_table


@contextlib.contextmanager
def _scoped_shuffle_partitions(spark: SparkSession, n: int):
    """Down-tune the state-store partition count for a replay and
    RESTORE it afterwards — library callers invoking these functions
    directly must not inherit a permanently re-tuned session (the
    query-registry wrapper would mask this by re-tuning per query)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _drain_view(spark: SparkSession, name: str, result: DataFrame) -> DataFrame:
    """Materialize a memory-sink-derived result and DROP the sink's
    temp view: the uuid-named views would otherwise accrete one per
    invocation for the session's lifetime (the same leak class as the
    round-2 ngram persist).  Gate results are small; the caller gets
    a local DataFrame with the identical schema."""
    rows = result.collect()
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, result.schema)


def _await_converged(q, timeout_s: int = 300) -> None:
    """availableNow replays must DRAIN; on timeout, stop the query and
    fail loudly instead of returning partial results (and instead of
    rmtree-ing a source a live stream still reads)."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise RuntimeError(
            f"streaming replay did not converge within {timeout_s}s"
        )


def _replay_windowed_counts(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """Sliding-window count/sum replayed through REAL streaming
    (update mode, state store), with each key's FINAL emission
    captured directly: a foreachBatch sink overwrites a driver-side
    dict entry per (window, event_type) in batch order, so the result
    needs NO monotonicity assumption about ``value`` — correct for
    negative, zero, or positive values alike."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="window_counts_src_")
    try:
        ev.repartition(4).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        with _scoped_shuffle_partitions(spark, 8):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 2)
                .parquet(tmp)
            )
            agg = (
                stream.groupBy(
                    F.window("ts", "1 hour", "30 minutes").alias("w"),
                    "event_type",
                )
                .agg(
                    F.count("*").alias("n"),
                    F.sum(F.col("value").cast("decimal(28,6)"))
                    .cast("decimal(28,6)")
                    .cast("double")
                    .alias("total"),
                )
                .select(
                    F.col("w.start").alias("window_start"),
                    "event_type",
                    "n",
                    "total",
                )
            )
            final: dict = {}

            def capture(batch_df: DataFrame, batch_id: int) -> None:
                # update mode emits the keys changed in this batch with
                # their LATEST aggregate values; batches arrive in
                # order, so overwriting yields each key's last emission
                for r in batch_df.collect():
                    final[(r.window_start, r.event_type)] = (r.n, r.total)

            q = (
                agg.writeStream.outputMode("update")
                .foreachBatch(capture)
                .trigger(availableNow=True)
                .start()
            )
            _await_converged(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [
            (ws, et, n, total)
            for (ws, et), (n, total) in final.items()
        ],
        "window_start timestamp, event_type string, n long, total double",
    )


@register(
    "stream_window_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '30 minutes', ts)
             - i * INTERVAL '30 minutes' AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DECIMAL(28,6))
                AS DOUBLE) AS total
    FROM events, (VALUES (0), (1)) g(i)
    GROUP BY window_start, event_type
    """,
)
def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming execution of the sliding event-time window
    aggregate (1h width, 30min slide — tumbling is the slide=width
    special case): the events replay through readStream micro-batches
    and the windowed aggregation state lives on the state store across
    batches (update mode, availableNow).

    The final value per (window, event_type) is each key's LAST
    update-mode emission, captured directly by a foreachBatch sink —
    no assumption about the sign or monotonicity of ``value``
    (tests/test_stateful.py perturbs the fixture with negatives).  No
    watermark on the replay: update-mode windowed aggregation keeps
    all state for the finite replay, so out-of-order files cannot
    drop rows; the watermarked production form (state eviction +
    late-drop) is exercised in tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    return _replay_windowed_counts(spark, ev)


@register(
    "stateful_running_stats",
    oracle="""
    SELECT user_id AS key,
           COUNT(*) AS n_events,
           MAX(lpad(CAST(event_id AS VARCHAR), 12, '0')) AS max_seq
    FROM events
    GROUP BY user_id
    """,
)
def stateful_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stateful streaming execution: the CDC envelope stream is
    replayed through ``applyInPandasWithState`` (per-key GroupState on
    the state store, update mode, availableNow) and the converged
    running stats are returned — the oracle checks them against the
    batch aggregate, proving state survives across micro-batches.

    n_events / max_seq are monotone per key, so the final value per
    key is the max over all update-mode emissions.
    """
    import tempfile
    import uuid

    from sample_keyspaces_cdc_streams_connectors_spark.envelope import synthesize_cdc
    from sample_keyspaces_cdc_streams_connectors_spark.operators import classify_operation, shape_output
    from sample_keyspaces_cdc_streams_connectors_spark.streaming.stateful import running_event_stats

    shaped = shape_output(
        classify_operation(synthesize_cdc(load_table(spark, sf_dir, "events")))
    ).select("user_id", "stream_sequence_number")

    import shutil

    tmp = tempfile.mkdtemp(prefix="stateful_src_")
    try:
        shaped.repartition(4).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        # the state-store partition count is fixed at stream start from
        # spark.sql.shuffle.partitions; 32 partitions × python workers ×
        # micro-batches is pure overhead at gate SF
        with _scoped_shuffle_partitions(spark, 8):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 2)
                .parquet(tmp)
            )
            name = f"stateful_{uuid.uuid4().hex[:8]}"
            q = (
                running_event_stats(stream)
                .writeStream.outputMode("update")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            _await_converged(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)  # memory sink holds the result
    return _drain_view(
        spark,
        name,
        spark.sql(
            f"SELECT key, max(n_events) AS n_events, max(max_seq) AS max_seq "
            f"FROM {name} GROUP BY key"
        ),
    )


@register(
    "session_window_agg",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming execution of ``F.session_window`` (30-minute
    gap) per user: events replay through readStream micro-batches in
    time-ordered chunks and SESSION-MERGE STATE lives on the state
    store across batches (a session spanning chunk boundaries is
    merged by the store, not by a batch sort).

    Append mode emits each session exactly once, AFTER the watermark
    passes its end — i.e. the FINAL merged session, which is what
    made this query batch-equivalent in round 2 (update-mode partial
    emissions are not reconstructible).  Two mechanics make the
    append-mode replay exact and terminating:

    - **Time-ordered chunk replay**: the events are split into three
      consecutive time ranges written as separate files whose mtimes
      force the file source to process them oldest-first, so the
      watermark (which lags one micro-batch) never drops an in-order
      event; the 1-minute delay absorbs boundary ties.
    - **Watermark sentinel**: one synthetic far-future event
      (``user_id = -1``, max ts + 2 h) in the LAST chunk pushes the
      final watermark past every real session's end, so the no-data
      flush batch emits the remaining open sessions before
      availableNow terminates.  The sentinel's own session is
      filtered out of the result.

    The oracle reconstructs identical sessions with gaps-and-islands
    SQL (Spark's session end = last event + gap).

    Scale: session state is per (user, open-session) and evicted at
    watermark + gap; the replay's chunking is a test-harness artifact
    — a production stream is already time-ordered per source
    partition and uses the identical plan."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    rows = run_session_replay(spark, ev, n_chunks=3)
    return spark.createDataFrame(
        rows,
        "user_id long, session_start timestamp, "
        "session_end timestamp, n_events long",
    )


def run_session_replay(
    spark: SparkSession, ev: DataFrame, n_chunks: int = 3
) -> list:
    """The session-window state-store replay, factored out of the
    gate (r8) so bench.py can drive it with a DIFFERENT chunk shape:
    ``n_chunks`` time-ordered file chunks + the watermark sentinel +
    the no-data flush batch — append-mode output is chunk-shape
    INVARIANT (the final merged sessions), so the gate (3 chunks,
    maximal cross-batch merging) and the bench (2 chunks, trigger
    cost amortized over fatter batches) replay the identical query
    and return identical rows.  ``ev`` must carry
    ``(user_id, ts, event_id)``.  Returns collected Rows with the
    sentinel's session filtered out."""
    import datetime
    import os
    import shutil
    import tempfile
    import time as time_mod
    import uuid

    base = tempfile.mkdtemp(prefix="session_replay_src_")
    name = f"sess_replay_{uuid.uuid4().hex[:8]}"
    try:
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
        span = (hi - lo) / n_chunks
        bounds = [lo + (i + 1) * span for i in range(n_chunks - 1)]
        sentinel = spark.createDataFrame(
            [(-1, hi + datetime.timedelta(hours=2), -1)],
            "user_id long, ts timestamp, event_id long",
        )
        chunks = []
        prev = None
        for b in bounds:
            cond = F.col("ts") < b
            if prev is not None:
                cond = cond & (F.col("ts") >= prev)
            chunks.append(ev.filter(cond))
            prev = b
        last = ev.filter(F.col("ts") >= prev) if prev is not None else ev
        chunks.append(last.unionByName(sentinel))
        seen: set[str] = set()
        for i, chunk in enumerate(chunks):
            chunk.coalesce(1).write.mode("append").parquet(base)
            stamp = time_mod.time() + i * 10
            for f in os.listdir(base):
                if f in seen:
                    continue
                seen.add(f)
                p = os.path.join(base, f)
                os.utime(p, (stamp, stamp))
        schema = spark.read.parquet(base).schema
        with _scoped_shuffle_partitions(spark, 8):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(base)
                .withWatermark("ts", "1 minute")
            )
            agg = (
                stream.groupBy(
                    "user_id",
                    F.session_window("ts", "30 minutes").alias("w"),
                )
                .agg(F.count("*").alias("n_events"))
                .select(
                    "user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events",
                )
            )
            q = (
                agg.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            _await_converged(q)
            rows = (
                spark.table(name).filter(F.col("user_id") != -1).collect()
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.catalog.dropTempView(name)
    return rows


@register(
    "stream_interval_join",
    oracle="""
    SELECT a.user_id, COUNT(*) AS n_pairs,
           MIN(epoch_us(b.ts) - epoch_us(a.ts)) AS min_lag_us,
           MAX(epoch_us(b.ts) - epoch_us(a.ts)) AS max_lag_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 2 HOUR
    GROUP BY a.user_id
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream interval join (click→purchase attribution
    within 2 h): both sides replay through readStream micro-batches
    and the JOIN STATE lives on the state store across batches — a
    pair emits when its later side arrives, exactly once.

    The replay runs without watermarks so state retains both full
    sides for the finite input and out-of-order files cannot lose
    matches; the watermarked production form (state bounded to the
    2-hour interval, late-side eviction) runs in
    tests/test_streaming.py.  The final per-user rollup is a batch
    aggregation over the emitted pairs (memory sink) — the cross-batch
    semantics under test are the join's.

    Scale: the equi-key (user_id) bounds the shuffle — each side
    shuffles once on user_id and the time-range is a residual, never a
    cross product; in streaming the watermark bounds the join STATE
    the same way (rows older than 2 h are evicted)."""
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="interval_join_src_")
    try:
        a_dir, b_dir = f"{base}/clicks", f"{base}/purchases"
        ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("a_user"), F.col("ts").alias("a_ts")
        ).repartition(4).write.mode("overwrite").parquet(a_dir)
        ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
        ).repartition(4).write.mode("overwrite").parquet(b_dir)

        with _scoped_shuffle_partitions(spark, 8):
            a = (
                spark.readStream.schema(spark.read.parquet(a_dir).schema)
                .option("maxFilesPerTrigger", 2)
                .parquet(a_dir)
            )
            b = (
                spark.readStream.schema(spark.read.parquet(b_dir).schema)
                .option("maxFilesPerTrigger", 2)
                .parquet(b_dir)
            )
            name = f"interval_join_{uuid.uuid4().hex[:8]}"
            q = (
                a.join(
                    b,
                    (F.col("a_user") == F.col("b_user"))
                    & (F.col("b_ts") >= F.col("a_ts"))
                    & (
                        F.col("b_ts")
                        <= F.col("a_ts") + F.expr("INTERVAL 2 HOURS")
                    ),
                )
                .writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            _await_converged(q)
    finally:
        shutil.rmtree(base, ignore_errors=True)  # memory sink holds the pairs
    pairs = spark.sql(f"SELECT * FROM {name}")
    lag_us = F.unix_micros(F.col("b_ts")) - F.unix_micros(F.col("a_ts"))
    return _drain_view(
        spark,
        name,
        pairs.groupBy(F.col("a_user").alias("user_id")).agg(
            F.count("*").alias("n_pairs"),
            F.min(lag_us).alias("min_lag_us"),
            F.max(lag_us).alias("max_lag_us"),
        ),
    )


@register(
    "stream_dedup_watermark",
    # CAST: DuckDB SUM(BIGINT) yields HUGEINT → hash-diverges from
    # Spark's BIGINT
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS id_sum
    FROM events
    GROUP BY event_type
    """,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming execution of ``dropDuplicatesWithinWatermark``:
    every event is doubled (copies adjacent, so both land in the same
    micro-batch), replayed through readStream with a 1-hour watermark,
    and deduplicated by event_id on the state store.  The converged
    output must equal the original table — the oracle aggregates the
    un-doubled events.

    Scale: state holds only keys younger than the watermark delay;
    older keys are evicted, which is the property that makes streaming
    dedup bounded-memory at 100 TB/day ingest."""
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    doubled = ev.withColumn(
        "copy", F.explode(F.array(F.lit(1), F.lit(2)))
    ).drop("copy")

    tmp = tempfile.mkdtemp(prefix="dedup_wm_src_")
    try:
        doubled.repartition(4).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        # fewer state partitions at gate SF — see stateful_running_stats
        with _scoped_shuffle_partitions(spark, 8):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 2)
                .parquet(tmp)
            )
            name = f"dedup_wm_{uuid.uuid4().hex[:8]}"
            q = (
                stream.withWatermark("ts", "1 hour")
                .dropDuplicatesWithinWatermark(["event_id"])
                .writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            _await_converged(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)  # memory sink holds the result
    return _drain_view(
        spark,
        name,
        spark.sql(
            f"SELECT event_type, count(*) AS n, sum(event_id) AS id_sum "
            f"FROM {name} GROUP BY event_type"
        ),
    )
