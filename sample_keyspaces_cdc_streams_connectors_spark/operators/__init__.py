from sample_keyspaces_cdc_streams_connectors_spark.operators.asof import asof_join
from sample_keyspaces_cdc_streams_connectors_spark.operators.batching import (
    assign_messages,
    time_partition,
    time_partition_columns,
)
from sample_keyspaces_cdc_streams_connectors_spark.operators.classify import classify_operation, operation_type_column
from sample_keyspaces_cdc_streams_connectors_spark.operators.filtering import cdc_filter
from sample_keyspaces_cdc_streams_connectors_spark.operators.mv import mv_apply
from sample_keyspaces_cdc_streams_connectors_spark.operators.projection import (
    coalesce_image,
    enrich_metadata,
    flatten_full_image,
    project_fields,
    shape_output,
)
from sample_keyspaces_cdc_streams_connectors_spark.operators.prefixsum import with_order_stats
from sample_keyspaces_cdc_streams_connectors_spark.operators.range_join import range_join
from sample_keyspaces_cdc_streams_connectors_spark.operators.skew import add_salt, explode_salt, salted_agg

__all__ = [
    "with_order_stats",
    "asof_join",
    "assign_messages",
    "classify_operation",
    "operation_type_column",
    "cdc_filter",
    "mv_apply",
    "project_fields",
    "coalesce_image",
    "flatten_full_image",
    "enrich_metadata",
    "range_join",
    "shape_output",
    "add_salt",
    "explode_salt",
    "salted_agg",
    "time_partition",
    "time_partition_columns",
]
