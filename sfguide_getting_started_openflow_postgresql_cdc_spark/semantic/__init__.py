from sfguide_getting_started_openflow_postgresql_cdc_spark.semantic.model import (
    ColumnSpec,
    Relationship,
    SemanticModel,
    TableSpec,
    healthcare_model,
)

__all__ = [
    "ColumnSpec",
    "Relationship",
    "SemanticModel",
    "TableSpec",
    "healthcare_model",
]
