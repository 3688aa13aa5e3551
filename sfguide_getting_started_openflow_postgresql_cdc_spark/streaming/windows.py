"""Streaming windowed aggregation with watermarks (SURVEY.md §2.I5).

The batch twin of this plan is ``i5_tumbling_window_agg`` (oracle-checked);
this module runs the SAME aggregation incrementally over a stream with a
watermark bounding state. The reference's analog is the 1-minute sync
cadence batching (sql/3.live_appointments.sql:48-49).

Scale notes: state is keyed by (window, event_type) — cardinality is
bounded by watermark horizon x type cardinality, independent of input
volume; decimal sums keep the aggregates exact and merge-order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.schemas import EVENTS


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts+sums per event_type; works on both batch
    and streaming frames (same Catalyst plan, incrementalized when
    streaming).

    Watermarks require a TZ-aware event-time column, while the engine's
    canonical timestamps are NTZ — convert at the boundary (session TZ
    pinned UTC, so the round-trip is the identity on wall-clock values).
    """
    events.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def start_windowed_aggregation(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "windowed_events",
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """File-source stream -> watermarked window agg -> memory sink (tests)
    — swap the sink for parquet/kafka in production; the plan is identical."""
    stream = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    agg = windowed_event_counts(stream, window=window, watermark=watermark)
    writer = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sessionized_event_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """SESSION-window aggregation per user (the streaming twin of the
    batch gaps-and-islands ``i9_sessionization``): ``session_window``
    merges events separated by less than ``gap`` into one growing
    window, closing it ``gap`` after the last event. Works on batch and
    streaming frames with the same plan; when streaming, the watermark
    bounds open-session state and append mode emits each session ONCE,
    finalized — state is keyed by (user, open session), independent of
    input volume.

    ``session_end`` follows session_window semantics (last event + gap);
    ``n_events``/``session_start`` match the batch i9 spans exactly,
    which the e2e test asserts."""
    events.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def start_sessionized_aggregation(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "sessionized_events",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """File-source stream -> watermarked session windows -> memory sink
    (tests); swap the sink in production, the plan is identical."""
    stream = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    agg = sessionized_event_stats(stream, gap=gap, watermark=watermark)
    writer = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
