from sample_keyspaces_cdc_streams_connectors_spark.streaming.pipeline import CdcPipeline, PipelineConfig

__all__ = ["CdcPipeline", "PipelineConfig"]
