"""Structured Streaming assembly of the CDC pipeline.

Reference lifecycle (KCLMainRunner.java:25-113, KCLScheduler.java:
101-168): config → scheduler → per-shard processor where each batch
is filter → handle (shape/serialize/sink) → checkpoint-on-success
(KeyspacesRecordProcessor.java:41-60).  Spark mapping:

- KCL scheduler + DynamoDB lease table  → Structured Streaming
  micro-batch engine + ``checkpointLocation`` (offsets + commits
  give the same checkpoint-after-successful-sink contract, hence the
  same at-least-once delivery into idempotent sinks).
- shard fan-out / lease stealing        → Spark task scheduling over
  source partitions.
- ``ITargetMapper`` reflective plugin   → a sink registry of
  ``foreachBatch`` callables (:mod:`.sinks`).

The pipeline itself is sink-agnostic: source DataFrame → the SAME
pure batch operators from :mod:`..operators` (classification, filter,
shaping) → writeStream.  In tests the source is a file stream of
envelope parquet (or rate source synthesized), in production a
Kinesis-compatible connector — swapping the source never touches the
transform stack.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from sample_keyspaces_cdc_streams_connectors_spark.operators import cdc_filter, classify_operation, shape_output


@dataclass(frozen=True)
class PipelineConfig:
    """The engine analog of the reference's HOCON block
    (KeyspacesConfig.java:226-357): filter expression, output shaping
    and sink selection, with the same defaults."""

    filter_expression: str | None = None  # JEXL-semantics predicate
    record_format: str = "default"  # full|new-image|old-image|fields-only
    fields_to_include: Sequence[str] | None = None
    include_metadata: bool = True
    checkpoint_dir: str | None = None
    trigger_interval: str | None = None  # e.g. "5 seconds"; None=once


class CdcPipeline:
    """source → classify → filter → shape → foreachBatch sink."""

    def __init__(self, config: PipelineConfig):
        self.config = config

    def transform(self, env: DataFrame) -> DataFrame:
        """The pure (stream- and batch-applicable) transform stack."""
        df = classify_operation(env)
        df = cdc_filter(df, self.config.filter_expression)
        return shape_output(
            df,
            record_format=self.config.record_format,
            fields=self.config.fields_to_include,
            include_metadata=self.config.include_metadata,
        )

    def read_envelope_stream(
        self, spark: SparkSession, path: str, schema
    ) -> DataFrame:
        """File-based envelope source for tests (maxFilesPerTrigger
        bounds micro-batch size the way KCL bounds records per poll)."""
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )

    def start(
        self,
        env_stream: DataFrame,
        sink: Callable[[DataFrame, int], None],
        query_name: str = "cdc-pipeline",
    ) -> StreamingQuery:
        """Attach the transform stack and run with checkpointing.

        ``sink`` is a ``(batch_df, batch_id) -> None`` callable —
        exceptions propagate and fail the batch, so the engine does
        NOT advance the checkpoint (the reference's
        checkpoint-only-on-success contract,
        KeyspacesRecordProcessor.java:48-56).
        """
        shaped = self.transform(env_stream)
        writer = (
            shaped.writeStream.queryName(query_name)
            .foreachBatch(sink)
            .outputMode("append")
        )
        if self.config.checkpoint_dir:
            writer = writer.option(
                "checkpointLocation", self.config.checkpoint_dir
            )
        if self.config.trigger_interval:
            writer = writer.trigger(processingTime=self.config.trigger_interval)
        else:
            writer = writer.trigger(availableNow=True)
        return writer.start()
