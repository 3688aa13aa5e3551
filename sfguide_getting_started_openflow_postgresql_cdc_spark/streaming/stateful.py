"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2 "custom operators" tier (b): Pandas-backed state when
built-in operators can't express the semantics).

``running_user_stats`` maintains per-user running aggregates across
micro-batches — the pattern behind live per-entity counters, fraud
velocity checks, or per-source ingest accounting. State is keyed by
user_id; each micro-batch updates the key's state and emits the new
running totals (update output mode).

Scale notes: state lives in the state store partitioned by key hash —
the same layout as the groupBy shuffle, so no extra exchange. The
pandas function is a self-contained closure (shipped by value; workers
need no import path). Arrow batches bound per-invocation memory.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

from sfguide_getting_started_openflow_postgresql_cdc_spark.schemas import EVENTS

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_batches", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_batches", T.LongType()),
    ]
)


def _make_update_fn():
    """Build the state-update function as a NESTED closure: cloudpickle
    then ships it by value, so Spark's Python workers never need this
    package on their import path (module-level functions pickle by
    reference and break under a driver-managed environment)."""

    def update_user_stats(key, pdfs, state):
        import pandas as pd

        n, total, batches = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        batches += 1
        state.update((n, total, batches))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "n_batches": [batches],
            }
        )

    return update_user_stats


def start_running_user_stats(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "user_stats",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Stream events -> per-user running stats with keyed state."""
    stream = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    stats = stream.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        stats.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# NOTE: a transformWithStateInPandas twin of running_user_stats existed
# here through round 3, but the API's state-server protocol requires the
# google.protobuf runtime (pyspark ships only generated stubs), which
# this environment cannot provide — so the twin could never be executed,
# only skipped. Rather than ship a permanently-unverified operator, the
# twin was removed; ``start_running_user_stats`` above expresses the
# identical semantics on applyInPandasWithState and is fully tested.
