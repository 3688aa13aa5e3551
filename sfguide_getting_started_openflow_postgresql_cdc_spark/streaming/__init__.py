from sfguide_getting_started_openflow_postgresql_cdc_spark.streaming.cdc import (
    CdcEngine,
    ReplicaStore,
)

__all__ = ["CdcEngine", "ReplicaStore"]
