"""Operator inventory (SURVEY.md §2) — importing this package registers
every query builder and its DuckDB oracle twin into the registry."""

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators import (  # noqa: F401
    aggregations,
    cdc_audit,
    datagen,
    dedup,
    joins,
    multimodal,
    projections,
    reports,
    similarity,
    text,
    windows,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import (
    ORACLES,
    QUERIES,
)

__all__ = ["QUERIES", "ORACLES"]
