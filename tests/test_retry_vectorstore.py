"""Retry policies (VectorHelper.java:25-97) and vector-record
construction/typing (S3VectorTargetMapper.java:87-177)."""

from __future__ import annotations

import random

import pytest

from sample_keyspaces_cdc_streams_connectors_spark.streaming.retry import (
    backoff_delay,
    is_retryable,
    with_backoff,
    with_linear_retry,
)


class _FixedRng:
    def __init__(self, v: float):
        self.v = v

    def random(self) -> float:
        return self.v


def test_is_retryable_markers():
    assert is_retryable(RuntimeError("ThrottlingException: slow down"))
    assert is_retryable(RuntimeError("got 503 from upstream"))
    assert not is_retryable(RuntimeError("ValidationError"))
    assert not is_retryable(RuntimeError())  # null message


def test_backoff_sequence_and_cap():
    rng = _FixedRng(0.5)  # zero jitter
    delays = [backoff_delay(a, rng=rng) for a in range(6)]
    assert delays == [1.0, 2.0, 4.0, 8.0, 10.0, 10.0]  # x2 capped at 10
    # jitter bounds: +-5% of the delay
    lo = backoff_delay(0, rng=_FixedRng(0.0))
    hi = backoff_delay(0, rng=_FixedRng(0.999999))
    assert 0.94 < lo < 0.9501 and 1.0499 < hi < 1.06


def test_with_backoff_retries_transient_then_succeeds():
    calls, slept = [], []
    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("ThrottlingException")
        return "ok"

    wrapped = with_backoff(
        flaky, max_retries=3, sleep=slept.append, rng=_FixedRng(0.5)
    )
    assert wrapped() == "ok"
    assert len(calls) == 3
    assert slept == [1.0, 2.0]


def test_with_backoff_nonretryable_raises_immediately():
    calls = []

    def bad():
        calls.append(1)
        raise RuntimeError("ValidationError")

    wrapped = with_backoff(bad, max_retries=5, sleep=lambda s: None)
    with pytest.raises(RuntimeError, match="failed after 6 attempts"):
        wrapped()
    assert len(calls) == 1  # no retry for non-transient


def test_with_backoff_exhaustion_chains_cause():
    def always():
        raise RuntimeError("503")

    wrapped = with_backoff(always, max_retries=2, sleep=lambda s: None)
    with pytest.raises(RuntimeError) as ei:
        wrapped()
    assert "503" in str(ei.value.__cause__)


def test_linear_retry_sleeps_step_times_attempt():
    slept, calls = [], []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("anything")  # MV path retries everything
        return 42

    assert with_linear_retry(flaky, max_retries=3, sleep=slept.append)() == 42
    assert slept == [0.010, 0.020]


# --- vector records -------------------------------------------------------


def _df(spark):
    return spark.createDataFrame(
        [("k1", [0.1, 0.2], "t", 3, 1.5, True, None)],
        "key string, emb array<float>, title string, votes int, "
        "pop double, good boolean, blob binary",
    )


def test_vector_records_shape(spark):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.vectorstore import vector_records

    out = vector_records(
        _df(spark), "key", "emb", ["title", "votes", "pop", "good"]
    )
    assert out.columns == ["key", "data", "metadata"]
    row = out.collect()[0]
    assert row.key == "k1"
    assert row.metadata.title == "t" and row.metadata.votes == 3


def test_vector_records_decimal_stringified(spark):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.vectorstore import vector_records

    df = spark.createDataFrame(
        [("k", [0.1], None)], "key string, emb array<float>, d decimal(10,2)"
    )
    out = vector_records(df, "key", "emb", ["d"])
    assert dict(out.dtypes)["metadata"] == "struct<d:string>"


def test_vector_records_rejects_nonstring_key(spark):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.vectorstore import vector_records

    df = spark.createDataFrame([(1, [0.1])], "k int, emb array<float>")
    with pytest.raises(TypeError, match="key"):
        vector_records(df, "k", "emb")


def test_vector_records_rejects_binary_metadata(spark):
    from sample_keyspaces_cdc_streams_connectors_spark.llm.vectorstore import vector_records

    with pytest.raises(TypeError, match="Unsupported metadata type"):
        vector_records(_df(spark), "key", "emb", ["blob"])


def test_embedding_input_fallback(spark):
    from pyspark.sql import functions as F

    from sample_keyspaces_cdc_streams_connectors_spark.llm.vectorstore import embedding_input

    df = spark.createDataFrame(
        [("some text", "k1"), ("", "k2"), (None, "k3")],
        "text string, key string",
    ).select(embedding_input(F.col("text"), F.col("key")).alias("inp"))
    assert [r.inp for r in df.collect()] == ["some text", "k2", "k3"]


def test_embedding_input_neither_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F

    from sample_keyspaces_cdc_streams_connectors_spark.llm.vectorstore import embedding_input

    df = spark.createDataFrame(
        [("", None)], "text string, key string"
    ).select(embedding_input(F.col("text"), F.col("key")).alias("inp"))
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "No description or key field" in str(ei.value)

def _collect_dir_factory(out_dir: str):
    """Picklable executor-side put: append one jsonl line per vector."""

    def make():
        def put(batch):
            import json
            import os
            import uuid

            path = os.path.join(out_dir, f"{uuid.uuid4().hex}.jsonl")
            with open(path, "w", encoding="utf-8") as fh:
                for row in batch:
                    fh.write(
                        json.dumps(
                            {"key": row["key"], "dims": len(row["data"])}
                        )
                        + "\n"
                    )

        return put

    return make


def test_vector_upsert_sink_streaming_end_to_end(spark, tmp_path):
    """readStream -> embed -> vector_records shaping -> executor-side
    puts across micro-batches: every row lands exactly once as a
    typed vector record (the reference's KCL-batch -> PutVectors flow,
    S3VectorTargetMapper.java:87-177, as a Structured Streaming sink)."""
    import glob
    import json

    from pyspark.sql import functions as F

    from sample_keyspaces_cdc_streams_connectors_spark.llm.embedding import hash_embed
    from sample_keyspaces_cdc_streams_connectors_spark.llm.vectorstore import vector_upsert_sink

    src = str(tmp_path / "src")
    spark.range(30).selectExpr(
        "cast(id as string) as key", "concat('doc ', id) as text"
    ).repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema

    out = tmp_path / "puts"
    out.mkdir()
    sink = vector_upsert_sink(
        _collect_dir_factory(str(out)),
        key_field="key",
        embedding_col="emb",
        metadata_fields=(),
        batch_size=7,
    )

    def with_embeddings(batch_df, batch_id):
        sink(
            batch_df.withColumn("emb", hash_embed(F.col("text"), 32)),
            batch_id,
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(with_embeddings)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    recs = [
        json.loads(line)
        for p in glob.glob(str(out / "*.jsonl"))
        for line in open(p, encoding="utf-8")
    ]
    assert sorted(int(r["key"]) for r in recs) == list(range(30))
    assert {r["dims"] for r in recs} == {32}
