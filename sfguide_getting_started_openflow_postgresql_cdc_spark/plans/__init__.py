from sfguide_getting_started_openflow_postgresql_cdc_spark.plans.inspect import (
    explain_str,
    has_broadcast_hash_join,
    has_take_ordered,
    pushed_filters,
    scan_read_schema,
)

__all__ = [
    "explain_str",
    "has_broadcast_hash_join",
    "has_take_ordered",
    "pushed_filters",
    "scan_read_schema",
]
