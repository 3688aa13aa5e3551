"""Custom stateful streaming operator: running per-user stats must
converge to the batch ground truth across multi-batch delivery."""

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
