"""Custom stateful streaming operator: running per-user stats must
converge to the batch ground truth across multi-batch delivery."""

import pytest
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import load_table
from sfguide_getting_started_openflow_postgresql_cdc_spark.streaming.stateful import (
    start_running_user_stats,
)


def test_running_user_stats_converges(spark, tmp_path):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "stream_src")
    # three files -> three micro-batches (state must carry across them)
    events.repartition(3).write.parquet(src, mode="overwrite")

    q = start_running_user_stats(
        spark, src, checkpoint_dir=str(tmp_path / "ck"), query_name="ustats"
    )
    q.awaitTermination(120)

    out = spark.sql("SELECT * FROM ustats")
    # update mode appends one row per (user, batch-touch); the final state
    # is the row with the highest n_events per user (monotonic)
    final = {
        r["user_id"]: r
        for r in out.orderBy("user_id", "n_events").collect()
    }
    truth = {
        r["user_id"]: r
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert set(final) == set(truth)
    multi_batch = 0
    for uid, row in final.items():
        assert row["n_events"] == truth[uid]["n"], uid
        assert abs(row["total_value"] - (truth[uid]["v"] or 0.0)) < 1e-6, uid
        if row["n_batches"] > 1:
            multi_batch += 1
    # state genuinely carried across micro-batches for many users
    assert multi_batch > 0


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """Exact duplicates injected into the stream collapse to one row per
    event_id; the surviving set equals batch dropDuplicates on the same
    input."""
    from pyspark.sql import functions as F

    from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import (
        load_table,
    )
    from sfguide_getting_started_openflow_postgresql_cdc_spark.streaming.dedup import (
        start_stream_dedup,
    )

    src = str(tmp_path / "dup_stream")
    base = load_table(spark, "/root/testdata/sf0.001", "events").limit(500)
    dup = base.limit(120)  # exact replays (same event_id, same ts)
    base.unionByName(dup).coalesce(2).write.parquet(src, mode="overwrite")

    q = start_stream_dedup(
        spark, src, checkpoint_dir=str(tmp_path / "ck_dedup"), query_name="dd_stream"
    )
    q.awaitTermination(120)

    streamed = spark.sql("SELECT * FROM dd_stream")
    assert streamed.count() == 500
    assert streamed.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0
    batch_ids = {r["event_id"] for r in base.select("event_id").distinct().collect()}
    stream_ids = {r["event_id"] for r in streamed.select("event_id").collect()}
    assert stream_ids == batch_ids


