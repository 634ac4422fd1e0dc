from sample_keyspaces_cdc_streams_connectors_spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
    spread_scan,
    table_path,
)

__all__ = ["TABLES", "load_table", "load_tables", "spread_scan", "table_path"]
