from sample_keyspaces_cdc_streams_connectors_spark.streaming.pipeline import CdcPipeline, PipelineConfig
from sample_keyspaces_cdc_streams_connectors_spark.streaming.sinks import (
    AllItemsFailureError,
    PartialFailureError,
    QueueTransport,
    console_sink,
    local_dir_transport,
    memory_rows_sink,
    object_store_sink,
    queue_sink,
)

__all__ = [
    "AllItemsFailureError",
    "CdcPipeline",
    "PartialFailureError",
    "PipelineConfig",
    "QueueTransport",
    "console_sink",
    "local_dir_transport",
    "memory_rows_sink",
    "object_store_sink",
    "queue_sink",
]
