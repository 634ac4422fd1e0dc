"""PySpark-native analytics engine with the query/data-processing
capabilities of aws-samples/sample-keyspaces-cdc-streams-connectors.

The reference (read-only at /root/reference) is a Java/KCL stream
processor: Keyspaces CDC source -> operation classification -> JEXL
predicate filter -> projection/format shaping -> JSON/Avro
serialization -> size-bounded batching -> partitioned sinks
(S3 / SQS / Keyspaces MV / S3 Vectors).  This package re-expresses
every stage Spark-first:

- the CDC record envelope is a fixed ``StructType`` DataFrame schema
  (:mod:`.envelope`),
- every row transform is a pure ``DataFrame -> DataFrame`` operator
  built from Column expressions (:mod:`.operators`) so Catalyst gets
  pushdown / pruning / codegen for free,
- streaming assembly uses Structured Streaming with ``foreachBatch``
  sinks (:mod:`.streaming`),
- the LLM-data-pipeline extensions (dedup, similarity search,
  multimodal columns, text analysis) live in :mod:`.llm` and
  :mod:`.functions`.

Design target: a 1000-executor cluster over ~100 TB.  No driver-side
row loops, no row-at-a-time Python UDFs in hot paths; Python reaches
the data only through Arrow-batched pandas UDFs where Spark built-ins
genuinely cannot express the semantics.
"""

from sample_keyspaces_cdc_streams_connectors_spark.session import get_spark, tune

__all__ = ["get_spark", "tune"]
