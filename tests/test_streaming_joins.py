"""Stream-stream interval join (matches its batch twin) and CDC
checkpoint recovery (a restarted stream resumes from state without
duplicating or losing events)."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import load_table
from sfguide_getting_started_openflow_postgresql_cdc_spark.streaming.joins import (
    interval_join,
)

EVENT_COLS = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
    ]
)


def _sides(df):
    left = df.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("l_ts")
    )
    right = df.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("r_ts")
    )
    return left, right


def test_stream_interval_join_matches_batch(spark, tmp_path):
    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "event_type", "ts"
    )
    src = str(tmp_path / "src")
    events.repartition(2).write.parquet(src)

    # batch ground truth: same predicate as the streaming composition
    bdf = spark.read.schema(EVENT_COLS).parquet(src).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    bl, br = _sides(bdf)
    batch = (
        bl.join(
            br,
            (bl.user_id == br.user_id)
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1800 SECONDS")),
        )
        .drop(br.user_id)
        .collect()
    )

    stream = spark.readStream.schema(EVENT_COLS).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    sl, sr = _sides(stream)
    joined = interval_join(sl, sr, "user_id", interval_seconds=1800)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("sj")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM sj").collect()

    key = lambda r: (r["user_id"], r["l_ts"], r["r_ts"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, batch))
    assert batch, "fixture should produce view->purchase pairs"


def test_cdc_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Stop a CDC stream, add more event files, restart with the SAME
    checkpoint: already-applied files must not reprocess (journal stays
    duplicate-free) and new files must apply."""
    import json

    from sfguide_getting_started_openflow_postgresql_cdc_spark.streaming.cdc import (
        CdcEngine,
        ReplicaStore,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    eng = CdcEngine(
        ReplicaStore(str(tmp_path / "w")),
        tables={"t": schema},
        primary_keys={"t": "id"},
        write_partitions=1,
        n_buckets=4,
    )
    eng.bootstrap(
        spark,
        {"t": spark.createDataFrame([(1, "a")], schema)},
        "2024-01-01 00:00:00",
        journal_snapshot=False,
    )

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)

    def write_file(n, rows):
        with open(os.path.join(events_dir, f"batch{n}.jsonl"), "w") as f:
            for seq, op, key, val in rows:
                f.write(
                    json.dumps(
                        {
                            "seq_no": seq,
                            "event_ts": f"2024-01-01 00:{seq:02d}:00",
                            "table_name": "t",
                            "op": op,
                            "after": {"id": str(key), "v": val},
                        }
                    )
                    + "\n"
                )

    ck = str(tmp_path / "ck")
    write_file(1, [(1, "U", 1, "b"), (2, "I", 2, "x")])
    q = eng.start_cdc(spark, events_dir, ck, available_now=True)
    q.awaitTermination(120)

    write_file(2, [(3, "U", 2, "y"), (4, "I", 3, "z")])
    q = eng.start_cdc(spark, events_dir, ck, available_now=True)  # restart
    q.awaitTermination(120)

    state = {r["id"]: r["v"] for r in eng.store.read(spark, "t").collect()}
    assert state == {1: "b", 2: "y", 3: "z"}
    journal = eng.store.read_journal(spark, "t")
    assert journal.count() == 4  # no reprocessing of batch 1
    assert journal.select("seq_no").distinct().count() == 4


def test_watermark_drops_late_events(spark, tmp_path):
    """An event older than the watermark horizon arriving in a LATER
    micro-batch must not reopen its already-finalized window (append
    mode) — the bounded-state guarantee late data is traded for."""
    import pandas as pd

    from sfguide_getting_started_openflow_postgresql_cdc_spark.schemas import EVENTS
    from sfguide_getting_started_openflow_postgresql_cdc_spark.streaming.windows import (
        start_windowed_aggregation,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)

    def write_batch(name, rows):
        import time

        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf, EVENTS).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)  # distinct mtimes -> deterministic file-source order

    # The watermark lags one batch (wm for batch N = batch N-1's max
    # minus the delay), and a late row is only dropped once its
    # window's state has been EVICTED — so two advancing batches run
    # between the on-time hour-10 data and the late arrival.
    write_batch("b1", [(1, "2024-01-01 10:05:00", 1, "view", 1.0, "{}"),
                       (2, "2024-01-01 10:10:00", 2, "view", 1.0, "{}")])
    write_batch("b2", [(3, "2024-01-01 20:00:00", 1, "view", 1.0, "{}")])
    write_batch("b3", [(4, "2024-01-01 23:00:00", 2, "view", 1.0, "{}")])
    write_batch("b4", [(5, "2024-01-01 10:20:00", 3, "view", 1.0, "{}")])

    q = start_windowed_aggregation(
        spark, src, str(tmp_path / "ck"), query_name="late_test"
    )
    q.awaitTermination(180)

    out = spark.sql("SELECT * FROM late_test").collect()
    hour10 = [
        r
        for r in out
        if r["window_start"].hour == 10 and r["event_type"] == "view"
    ]
    # exactly ONE finalized hour-10 row, late event NOT counted and no
    # duplicate emission after eviction
    assert len(hour10) == 1 and hour10[0]["n_events"] == 2
