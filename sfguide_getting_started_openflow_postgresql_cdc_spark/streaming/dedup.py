"""Streaming exact deduplication (the streaming face of dd1/dd2).

An LLM-ingest pipeline rarely sees its corpus as a static table — new
documents arrive continuously, and exact/near duplicates of
already-ingested content must be dropped online. This module provides:

- :func:`dedup_stream` — drop exact duplicates by key (or content
  fingerprint) within a watermark horizon via
  ``dropDuplicatesWithinWatermark``: state holds one entry per key seen
  inside the horizon and is evicted as the watermark advances, so state
  size is bounded by (arrival rate x horizon), independent of total
  corpus size. The batch twin is ``dropDuplicates`` / dd1.

Scale notes: the dedup state is hash-partitioned on the key — the same
single-shuffle layout as the batch hash-groupBy; no per-row Python.
Cross-horizon duplicates (re-ingested months later) are the batch dd1/
dd4 passes' job over the accumulated corpus — streaming dedup bounds the
common case, it does not replace offline dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.schemas import EVENTS


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Drop duplicate events by ``keys`` (default: event_id) arriving
    within the watermark horizon of each other. Works only on streaming
    frames (state eviction needs event time); exact replays of the same
    event — at-least-once sources, producer retries — collapse to one row.

    Watermarks require a TZ-aware event-time column, while the engine's
    canonical timestamps are NTZ — convert at the boundary (session TZ
    pinned UTC, so the round-trip is the identity on wall-clock values).
    """
    events.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys or ["event_id"])
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )


def start_stream_dedup(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "deduped_events",
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """File-source stream -> watermark dedup -> memory sink (tests) —
    swap the sink for parquet/kafka in production; the plan is identical."""
    stream = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    deduped = dedup_stream(stream, keys=keys, watermark=watermark)
    writer = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
