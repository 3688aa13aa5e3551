"""Operator inventory (SURVEY.md §2) — importing this package registers
every query builder and its DuckDB oracle twin into the registry.

Import order IS registry order, and external harnesses may check a
prefix of it under a budget — so modules whose queries most need fresh
evidence run first (window/report/ANN families plus anything changed
this round), and operators with long green history run last."""

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators import (  # noqa: F401
    windows,
    reports,
    similarity,
    multimodal,
    dedup,
    joins,
    projections,
    aggregations,
    cdc_audit,
    datagen,
    text,
)  # fmt: skip — listed order = registration order (see docstring)
from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import (
    ORACLES,
    QUERIES,
)

__all__ = ["QUERIES", "ORACLES"]
