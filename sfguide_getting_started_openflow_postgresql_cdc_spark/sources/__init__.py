from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import (
    load_table,
    load_tables,
    register_views,
)

__all__ = ["load_table", "load_tables", "register_views"]
