"""Streaming near-dup suppression: the narrow (stateless) MinHash
signature must equal the grouped batch path, and the real streaming
pipeline must suppress near-identical arrivals on the state store."""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.llm.dedup import (
    minhash_signatures,
    _doc_shingles,
    with_minhash_signature,
)
from sample_keyspaces_cdc_streams_connectors_spark.streaming.dedup import streaming_near_dedup


def test_narrow_signature_equals_grouped_path(spark, sf_dir):
    """Every per-row array_min must equal the grouped min over the
    exploded distinct shingles — same base hash, same permutations."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    grouped = minhash_signatures(_doc_shingles(docs, "text", 3))
    grouped_digest = grouped.select(
        "doc_id",
        F.md5(
            F.concat_ws(",", *[F.col(f"m{j}").cast("string") for j in range(16)])
        ).alias("sig"),
    )
    narrow = with_minhash_signature(docs).select(
        "doc_id", F.col("minhash_sig").alias("sig")
    )
    joined = narrow.alias("n").join(grouped_digest.alias("g"), "doc_id")
    assert joined.filter(F.col("n.sig") != F.col("g.sig")).count() == 0
    assert narrow.count() == grouped_digest.count()


def test_streaming_suppresses_near_identical(spark, sf_dir):
    """Duplicated documents replayed through the REAL state store:
    each signature survives exactly once; distinct docs all survive."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
        .withColumn(
            "ts",
            F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") % 600),
        )
    )
    doubled = docs.withColumn(
        "copy", F.explode(F.array(F.lit(1), F.lit(2)))
    ).drop("copy")

    tmp = tempfile.mkdtemp(prefix="stream_dedup_docs_")
    doubled.repartition(3).write.mode("overwrite").parquet(tmp)
    schema = spark.read.parquet(tmp).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
    )
    name = f"near_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_near_dedup(stream, delay="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    shutil.rmtree(tmp, ignore_errors=True)

    out = spark.sql(f"SELECT minhash_sig, count(*) AS n FROM {name} GROUP BY 1")
    # no signature admitted twice (copies are time-adjacent, well
    # inside the 30-minute watermark delay)
    assert out.filter(F.col("n") > 1).count() == 0
    # every distinct batch signature survived once
    expected = with_minhash_signature(docs).select("minhash_sig").distinct().count()
    assert out.count() == expected


def test_signature_is_narrow_no_shuffle(spark, sf_dir):
    """The signature projection must stay a map-only plan — no
    Exchange, no aggregate (that is what makes it streamable with a
    single downstream stateful op)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = (
        with_minhash_signature(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan
