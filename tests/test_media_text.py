"""Media-text recovery stage (r14 — llm/media_text.py): tag values +
subtitle transcripts become derived documents that flow through the
same cleaning chain as crawled text, batch and streaming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sample_keyspaces_cdc_streams_connectors_spark.config import load_config
from sample_keyspaces_cdc_streams_connectors_spark.llm.media_text import (
    derived_media_text_id,
    extract_media_text,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.mp3 import encode_mp3_stream
from sample_keyspaces_cdc_streams_connectors_spark.llm.subtitles import (
    encode_mp4_timed_text,
    format_srt,
)
from sample_keyspaces_cdc_streams_connectors_spark.llm.tags import encode_id3v2

SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("source", StringType(), True),
        StructField("media", BinaryType(), True),
    ]
)


def _rows():
    tagged_mp3 = (
        encode_id3v2([("TIT2", "A Song"), ("TPE1", "The Artist")])
        + encode_mp3_stream([128] * 2)
    )
    srt = format_srt(
        [(1, 0, 1500, "Hello there."), (2, 2000, 3200, "General greeting.")]
    )
    tx3g = encode_mp4_timed_text([(0, 900, "mp4 caption")])
    return [
        (1, "crawl text one", "web", bytearray(tagged_mp3)),
        (2, "crawl text two", "web", bytearray(srt)),
        (3, "crawl text three", "books", bytearray(tx3g)),
        (4, "crawl text four", "web", bytearray(b"\x00junk")),
        (5, "crawl text five", "web", None),
    ]


def test_operator_derives_tag_and_cue_docs(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    out = extract_media_text(df).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["media_text_src"], []).append(r)
    # originals all pass through with NULL src, payload intact
    originals = {r["doc_id"]: r for r in by_src[None]}
    assert set(originals) == {1, 2, 3, 4, 5}
    assert bytes(originals[1]["media"])[:3] == b"ID3"
    # the tagged MP3 derives ONE tags doc: values in container order
    (tag_doc,) = by_src["tags"]
    assert tag_doc["text"] == "A Song\nThe Artist"
    assert tag_doc["doc_id"] == derived_media_text_id(1, "tags")
    assert tag_doc["source"] == "web"  # parent columns copied
    assert tag_doc["media"] is None  # bytes never travel further
    # the SRT and the MP4 tx3g track each derive a transcript doc
    cue_docs = {r["doc_id"]: r for r in by_src["cues"]}
    assert cue_docs[derived_media_text_id(2, "cues")]["text"] == (
        "Hello there.\nGeneral greeting."
    )
    assert cue_docs[derived_media_text_id(3, "cues")]["text"] == (
        "mp4 caption"
    )
    # junk and NULL payloads derive nothing, parent rows survive
    assert len(out) == 5 + 3


def test_operator_is_map_only(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    plan = (
        extract_media_text(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pipeline_stage_feeds_cleaning_chain(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    cfg = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {"extract-media-text": "true"}
            }
        }
    )
    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import build_corpus_pipeline

    out = build_corpus_pipeline(cfg)(df)
    rows = out.collect()
    # derived docs went through annotation like any crawled doc
    assert {"lang", "quality", "n_tokens"} <= set(out.columns)
    derived = [r for r in rows if r["media_text_src"] is not None]
    assert {r["media_text_src"] for r in derived} == {"tags", "cues"}
    for r in derived:
        assert r["n_tokens"] > 0
    # exact dedup sees derived docs: plant a crawl doc whose text
    # equals the recovered transcript — one of the pair must drop
    clone = spark.createDataFrame(
        [(100, "Hello there.\nGeneral greeting.", "web", None)], SCHEMA
    )
    cfg2 = load_config(
        {
            "keyspaces-cdc-streams": {
                "corpus": {
                    "extract-media-text": "true",
                    "dedup": "exact",
                }
            }
        }
    )
    deduped = build_corpus_pipeline(cfg2)(df.unionByName(clone))
    texts = [r["text"] for r in deduped.collect()]
    assert texts.count("Hello there.\nGeneral greeting.") == 1


def test_missing_media_column_raises(spark):
    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no column 'media'"):
        extract_media_text(df)


def test_streaming_matches_batch(spark, tmp_path):
    import uuid

    from sample_keyspaces_cdc_streams_connectors_spark.llm.pipeline import (
        build_corpus_pipeline,
        build_streaming_curation,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(_rows(), SCHEMA).repartition(3).write.parquet(
        src
    )
    conf = {
        "keyspaces-cdc-streams": {
            "corpus": {"extract-media-text": "true", "languages": "en"}
        }
    }
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"mediatext_{uuid.uuid4().hex[:8]}"
    q = (
        build_streaming_curation(load_config(conf))(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    streamed = {
        (r["doc_id"], r["media_text_src"], r["text"])
        for r in spark.table(name)
        .select("doc_id", "media_text_src", "text")
        .collect()
    }
    spark.catalog.dropTempView(name)
    batch = build_corpus_pipeline(load_config(conf))(
        spark.read.parquet(src)
    )
    expected = {
        (r["doc_id"], r["media_text_src"], r["text"])
        for r in batch.select("doc_id", "media_text_src", "text").collect()
    }
    assert streamed == expected
    assert any(src_ is not None for _id, src_, _t in expected)
