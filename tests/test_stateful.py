"""Custom stateful streaming operators (applyInPandasWithState):
state persists across micro-batches and converges to batch truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.operators import shape_output
from sample_keyspaces_cdc_streams_connectors_spark.streaming.stateful import (
    last_image_tracker,
    running_event_stats,
)


@pytest.fixture(scope="module")
def shaped_parquet(spark, envelopes, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stateful") / "shaped")
    shaped = shape_output(envelopes.limit(300)).select(
        "user_id", "stream_sequence_number", "value"
    )
    shaped.repartition(3).write.parquet(path)
    return path, spark.read.parquet(path).schema


def _stream(spark, shaped_parquet):
    path, schema = shaped_parquet
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_running_stats_converge_to_batch(spark, shaped_parquet, tmp_path):
    stream = running_event_stats(_stream(spark, shaped_parquet))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("run_stats")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits one row per key per touched batch; the LAST
    # emission per key is the final running value
    emitted = spark.sql("SELECT * FROM run_stats").collect()
    final: dict = {}
    for r in emitted:  # memory sink preserves batch order
        final[r.key] = (r.n_events, r.max_seq)

    path, _ = shaped_parquet
    batch = {
        r.user_id: (r.n, r.mx)
        for r in spark.read.parquet(path)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.max("stream_sequence_number").alias("mx"),
        )
        .collect()
    }
    assert final == batch
    # state really crossed batches: some key must appear >1 time
    from collections import Counter

    seen = Counter(r.key for r in emitted)
    assert max(seen.values()) > 1


def test_last_image_tracker_matches_window(spark, shaped_parquet, tmp_path):
    stream = last_image_tracker(
        _stream(spark, shaped_parquet), key_cols=["user_id"], value_col="value"
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("lw_track")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final: dict = {}
    for r in spark.sql("SELECT * FROM lw_track").collect():
        final[r.user_id] = (r.seq, r.value)

    path, _ = shaped_parquet
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("stream_sequence_number").desc()
    )
    batch = {
        r.user_id: (r.stream_sequence_number, str(r.value))
        for r in spark.read.parquet(path)
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert final == batch


def test_windowed_replay_correct_with_negative_values(spark):
    """The stream_window_counts reconstruction must not depend on any
    sign/monotonicity property of `value`: a fixture with negative,
    zero and positive values must reproduce the batch aggregate
    exactly (the r2 form — max over update emissions — silently
    breaks on this input)."""
    import datetime

    from sample_keyspaces_cdc_streams_connectors_spark.queries.streaming import _replay_windowed_counts

    base = datetime.datetime(2024, 1, 1)
    vals = [-5.0, 3.25, 0.0, -2.5, 10.0, -1.0]
    rows = [
        (
            base + datetime.timedelta(minutes=7 * i),
            "a" if i % 3 else "b",
            vals[i % len(vals)],
        )
        for i in range(120)
    ]
    ev = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    )
    got = _replay_windowed_counts(spark, ev)
    exp = (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("decimal(28,6)")
            .cast("double")
            .alias("total"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total"
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exp.collect())
    )


def test_streaming_replay_restores_shuffle_partitions(spark, sf_dir):
    """Calling the streaming gate queries as library code must not
    leave the session permanently down-tuned to 8 shuffle
    partitions."""
    from sample_keyspaces_cdc_streams_connectors_spark.queries.streaming import stream_window_counts

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    stream_window_counts(spark, sf_dir).count()
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
