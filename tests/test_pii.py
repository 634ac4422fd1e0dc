"""PII detection / redaction (functions/pii.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.functions.pii import (
    pii_counts,
    scrub_pii,
    with_pii_scrubbed,
)

ROWS = [
    (1, "contact alice.smith+spam@example.co.uk for details"),
    (2, "call me at (555) 123-4567 or +1 555-987-6543 tomorrow"),
    (3, "server at 192.168.0.255 and 8.8.8.8 but not 999.1.1.1"),
    (4, "ssn 123-45-6789 on file"),
    (5, "card 4111 1111 1111 1111 expires soon"),
    (6, "clean text with number 12345 and version 1.2.3.4.5"),
]


def _scrubbed(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    return {r.doc_id: r for r in with_pii_scrubbed(df).collect()}


def test_each_kind_detected_and_redacted(spark):
    got = _scrubbed(spark)
    assert "[PII:email]" in got[1].text and "alice" not in got[1].text
    assert got[1].n_email == 1
    assert got[2].text.count("[PII:phone]") == 2 and got[2].n_phone == 2
    assert got[3].text.count("[PII:ipv4]") == 2 and got[3].n_ipv4 == 2
    assert "999.1.1.1" in got[3].text  # octet >255 is not an IP
    assert "[PII:ssn]" in got[4].text and got[4].n_ssn == 1
    assert "[PII:card]" in got[5].text and got[5].n_card == 1
    assert "1111" not in got[5].text


def test_clean_text_untouched(spark):
    got = _scrubbed(spark)
    assert got[6].text == ROWS[5][1]
    assert (
        got[6].n_email
        == got[6].n_phone
        == got[6].n_ipv4
        == got[6].n_ssn
        == got[6].n_card
        == 0
    )


def test_grouped_digits_classified_as_card_not_phone(spark):
    # 16 digits in groups of 4 must become ONE card token, not a
    # phone match on a 10-digit suffix
    df = spark.createDataFrame(
        [(1, "pay 4111-1111-1111-1111 now")], "doc_id long, text string"
    )
    row = with_pii_scrubbed(df).first()
    assert row.text == "pay [PII:card] now"
    assert row.n_card == 1 and row.n_phone == 0


def test_scrub_is_jvm_only_projection(spark):
    """The scrub must stay codegen-side: no Python eval nodes, no
    exchange — it is a pure per-row projection."""
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    plan = (
        with_pii_scrubbed(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_custom_token_and_counts_off(spark):
    df = spark.createDataFrame(ROWS[:1], "doc_id long, text string")
    out = with_pii_scrubbed(df, keep_counts=False)
    assert out.columns == ["doc_id", "text"]
    row = df.select(
        scrub_pii(F.col("text"), token="<x>").alias("t")
    ).first()
    assert "<x>" in row.t and "@" not in row.t


def test_scrub_works_on_streaming_frames(spark, tmp_path):
    """The scrub is a stateless projection, so it must compose with
    readStream unchanged — no aggregation state, no watermark
    needed."""
    src = str(tmp_path / "src")
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = with_pii_scrubbed(stream)
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("pii_stream")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {r.doc_id: r for r in spark.table("pii_stream").collect()}
    spark.catalog.dropTempView("pii_stream")
    assert len(got) == len(ROWS)
    assert "[PII:email]" in got[1].text and got[1].n_email == 1
    assert got[6].text == ROWS[5][1]
