"""Image shaping / projection / metadata enrichment
(AbstractJSONConverter.java:218-267, AbstractAvroConverter.java:100-134):
fields-to-include whitelist, coalesce image, full-format old_ flatten,
delete-forces-old-image, include-metadata toggle."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_keyspaces_cdc_streams_connectors_spark.operators import shape_output
from sample_keyspaces_cdc_streams_connectors_spark.operators.projection import project_fields


def test_project_fields_whitelist(envelopes):
    out = project_fields(envelopes, ["user_id", "value", "nonexistent"])
    new_fields = [
        f.name for f in out.schema["newImage"].dataType.fields
    ]
    assert new_fields == ["user_id", "value"]  # order preserved, unknown ignored
    old_fields = [f.name for f in out.schema["oldImage"].dataType.fields]
    assert old_fields == ["user_id", "value"]


def test_project_null_image_stays_null(envelopes):
    out = project_fields(envelopes, ["user_id"])
    n_null_before = envelopes.filter(F.col("newImage").isNull()).count()
    n_null_after = out.filter(F.col("newImage").isNull()).count()
    assert n_null_before == n_null_after > 0


def test_default_format_coalesces(envelopes):
    """default: newImage else oldImage — DELETE rows carry old values."""
    shaped = shape_output(envelopes, record_format="default")
    # every DELETE row still has a user_id (from the old image)
    deletes = shaped.filter(
        F.col("stream_operation_type").isin("DELETE", "REPLICATED_DELETE", "TTL")
    )
    assert deletes.count() > 0
    assert deletes.filter(F.col("user_id").isNull()).count() == 0


def test_full_format_flattens_old_prefix(envelopes):
    shaped = shape_output(envelopes, record_format="full")
    cols = set(shaped.columns)
    assert {"user_id", "old_user_id", "value", "old_value"} <= cols
    # old image value was synthesized as value - 1.0
    both = shaped.filter(
        F.col("value").isNotNull() & F.col("old_value").isNotNull()
    )
    assert both.count() > 0
    mismatch = both.filter(F.col("old_value") != F.col("value") - 1.0)
    assert mismatch.count() == 0


def test_include_metadata_toggle(envelopes):
    with_meta = shape_output(envelopes, include_metadata=True)
    without = shape_output(envelopes, include_metadata=False)
    assert "stream_sequence_number" in with_meta.columns
    assert "stream_sequence_number" not in without.columns
    assert "metadata" not in with_meta.columns  # struct dropped after enrich


def test_new_image_format_keeps_delete_payload(envelopes):
    """record-format=new-image still emits the old image for deletes
    (delete payloads live in the old image —
    AbstractAvroConverter.java:380-385)."""
    shaped = shape_output(envelopes, record_format="new-image")
    deletes = shaped.filter(
        F.col("stream_operation_type").isin("DELETE", "REPLICATED_DELETE", "TTL")
    )
    assert deletes.count() > 0
    assert deletes.filter(F.col("user_id").isNull()).count() == 0
