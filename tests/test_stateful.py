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
