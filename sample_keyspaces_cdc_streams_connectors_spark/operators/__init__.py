from sample_keyspaces_cdc_streams_connectors_spark.operators.classify import classify_operation, operation_type_column
from sample_keyspaces_cdc_streams_connectors_spark.operators.filtering import cdc_filter
from sample_keyspaces_cdc_streams_connectors_spark.operators.projection import (
    coalesce_image,
    enrich_metadata,
    flatten_full_image,
    project_fields,
    shape_output,
)

__all__ = [
    "classify_operation",
    "operation_type_column",
    "cdc_filter",
    "project_fields",
    "coalesce_image",
    "flatten_full_image",
    "enrich_metadata",
    "shape_output",
]
