"""CDC/journal-style queries over the events stream table (SURVEY.md §2.I).

The healthcare CDC engine itself lives in ``streaming/cdc.py`` (tested via
pytest fixtures); these operators exercise the same query shapes — latest
state per key, change-volume audit, hourly sync histograms — on the
driver's ``events`` table so they run under the DuckDB oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sfguide_getting_started_openflow_postgresql_cdc_spark.functions.shims import (
    decimal_sum,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import (
    AS_OF_EVENT_TS,
    query,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import load_table


@query(
    "i3_latest_state_per_key",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           ts AS last_ts
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def i3_latest_state_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per key — the dedupe-to-current-state step of the CDC
    merge (reference: upsert-by-PK semantics,
    sql/4.analytics_queries.sql:374-390; SURVEY.md §2.I3). Same
    row_number-over-key plan the merge uses per micro-batch."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("ts").alias("last_ts"),
        )
    )


@query(
    "i8_change_volume",
    oracle="""
    SELECT CAST(ts AS DATE) AS change_day,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_creates,
           COUNT(CASE WHEN event_type IN ('click','view','purchase') THEN 1 END)
               AS n_updates,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
           COUNT(*) AS n_total
    FROM events GROUP BY 1
    """,
)
def i8_change_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-volume audit by day/op-class (reference:
    sql/4.analytics_queries.sql:394-417 insert/update/delete counts)."""
    ev = load_table(spark, sf_dir, "events")
    et = F.col("event_type")
    return ev.groupBy(F.col("ts").cast("date").alias("change_day")).agg(
        F.count(F.when(et == "signup", 1)).alias("n_creates"),
        F.count(F.when(et.isin("click", "view", "purchase"), 1)).alias("n_updates"),
        F.count(F.when(et == "error", 1)).alias("n_errors"),
        F.count("*").alias("n_total"),
    )


@query(
    "i8_recent_changes",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_changes, MAX(ts) AS last_change
    FROM events
    WHERE ts >= TIMESTAMP '{AS_OF_EVENT_TS}' - INTERVAL 7 DAY
    GROUP BY user_id
    HAVING COUNT(*) >= 3
    """,
)
def i8_recent_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recently-changed keys audit with pinned as-of (reference:
    sql/4.analytics_queries.sql:375-390 last-24h CDC changes)."""
    cutoff = F.lit(AS_OF_EVENT_TS).cast("timestamp_ntz") - F.expr("INTERVAL 7 DAYS")
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts") >= cutoff)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_changes"), F.max("ts").alias("last_change"))
        .filter(F.col("n_changes") >= 3)
    )


@query(
    "i9_sessionization",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM x
    )
    SELECT user_id, CAST(session_id AS INT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM s GROUP BY 1, 2
    """,
)
def i9_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30 min starts a new session (lag + running
    sum — the batch twin of streaming ``session_window``). Windows
    partition on user_id, so the shuffle matches the key layout every
    other per-user operator uses."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_s = F.when(
        F.lag("ts").over(w).isNull() | (gap > 1800), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ev.withColumn("new_s", new_s)
        .withColumn("session_id", F.sum("new_s").over(run).cast("int"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@query(
    "i5_tumbling_window_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def i5_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation using Spark's streaming-native
    ``window()`` (reference: the 1-min sync-interval batching,
    sql/3.live_appointments.sql:48-49). Batch and streaming share this
    plan — in streaming it runs incrementally with a watermark
    (streaming/windows.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            decimal_sum("value").cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "i10_asof_join",
    oracle="""
    WITH ranked AS (
      SELECT user_id, ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM events
    ),
    e1 AS (
      SELECT user_id, ts, event_id, value FROM ranked WHERE rn = 1
    ),
    q AS (
      SELECT DISTINCT user_id,
             date_trunc('hour', ts) + INTERVAL 1 HOUR AS as_of_ts
      FROM events
    )
    SELECT q.user_id, q.as_of_ts,
           e1.event_id AS last_event_id,
           e1.value AS last_value
    FROM q ASOF JOIN e1
      ON q.user_id = e1.user_id AND q.as_of_ts >= e1.ts
    """,
)
def i10_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN — for every (user, end-of-active-hour) checkpoint, the
    latest event at or before that instant. Spark has no native ASOF
    join; the naive encoding (range-condition join + max) is a cross
    product per key. This is the scalable composition:

    UNION the probe rows into the event stream, window once per key
    ordered by (ts, side, event_id), and carry the last event struct
    forward (``last(..., ignorenulls=True)`` over unbounded-preceding) —
    ONE shuffle on the key, state O(1) per row, no range join anywhere.
    The same shape incrementalizes as a streaming stateful op.

    Ties: events sharing (user_id, ts) reduce to the max event_id first,
    and at probe instants the event side sorts before the probe side, so
    an event exactly AT the checkpoint is visible to it — both matching
    DuckDB's ASOF (greatest ts <= probe over unique keys) exactly.
    """
    ev = load_table(spark, sf_dir, "events")
    w_tie = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    e1 = (
        ev.withColumn("_rn", F.row_number().over(w_tie))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("side"),  # events sort before probes at equal ts
            F.struct("event_id", "value").alias("ev"),
        )
    )
    probes = (
        ev.select(
            "user_id",
            (F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz")
             + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        )
        .distinct()
        .select("user_id", "ts", F.lit(1).alias("side"), F.lit(None).cast(
            "struct<event_id:long,value:double>").alias("ev"))
    )
    merged = e1.unionByName(probes)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("ev", ignorenulls=True).over(w)
    return (
        merged.withColumn("_last", carried)
        .filter(F.col("side") == 1)
        .select(
            "user_id",
            F.col("ts").alias("as_of_ts"),
            F.col("_last.event_id").alias("last_event_id"),
            F.col("_last.value").alias("last_value"),
        )
    )


@query(
    "i11_range_join",
    oracle="""
    SELECT a.event_id,
           COUNT(b.event_id) AS n_following_1h
    FROM events a
    LEFT JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    GROUP BY a.event_id
    """,
)
def i11_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE JOIN — per event, how many same-user events follow within
    1 hour (burst detection). A naive range-condition join degenerates to
    a per-key cross product; the scalable composition BUCKETIZES time:

    each probe event joins candidates only in its own and the next hour
    bucket (b.ts in (a.ts, a.ts+1h] implies bucket(b) in {bucket(a),
    bucket(a)+1}), so the equi-join key is (user_id, bucket) and the
    residual range predicate filters candidates — work tracks actual
    temporal density, never n^2 per user. Counts then join back
    aggregate-below-join style (the c3 rewrite), with coalesce(0) for
    events with no followers.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.unix_timestamp("ts") / 3600)
    a = ev.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
        F.explode(F.array(bucket, bucket + 1)).alias("bkt"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        bucket.alias("bkt"),
    )
    counts = (
        a.join(
            b,
            (F.col("a_user") == F.col("b_user")) & (a["bkt"] == b["bkt"]),
        )
        .filter(
            (F.col("b_ts") > F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("a_id")
        .agg(F.count("*").alias("n"))
    )
    return ev.select(F.col("event_id")).join(
        counts, ev.event_id == counts.a_id, "left"
    ).select(
        "event_id",
        F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_following_1h"),
    )


@query(
    "i14_replication_freshness",
    oracle=f"""
    WITH m AS (
      SELECT event_type, COUNT(*) AS n_events, MAX(ts) AS latest_ts
      FROM events GROUP BY event_type
    )
    SELECT event_type, n_events, latest_ts,
           (epoch_us(TIMESTAMP '{AS_OF_EVENT_TS}') - epoch_us(latest_ts))
               // 60000000 AS staleness_minutes,
           (SELECT COUNT(*) FROM events e
            WHERE e.event_type = m.event_type
              AND e.ts >= TIMESTAMP '{AS_OF_EVENT_TS}' - INTERVAL 24 HOUR)
               AS n_last_24h
    FROM m
    """,
)
def i14_replication_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication-freshness audit per stream: how stale is each
    event_type's latest change vs the pinned "now", and how much volume
    arrived in the trailing 24 h — the lag dashboard a 1-minute CDC
    sync is monitored with (reference: the quickstart's sync-latency
    checks; SURVEY.md §2.I5 operational face).

    Exactness: staleness is computed on integer MICROSECOND epochs with
    integer floor division (all lags positive — pinned AS_OF postdates
    the stream), never on double seconds; the trailing-24 h count is a
    single conditional aggregate in the same groupBy pass (the oracle's
    correlated subquery is the same predicate, spelled for DuckDB)."""
    asof_us = 1706659200000000  # epoch_us('2024-01-31 00:00:00')
    cutoff = "2024-01-30 00:00:00"  # AS_OF - 24h, precomputed literal
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.max("ts").alias("latest_ts"),
            F.count(
                F.when(
                    F.col("ts") >= F.lit(cutoff).cast("timestamp_ntz"), 1
                )
            ).alias("n_last_24h"),
        )
        .withColumn(
            "_us",
            F.lit(asof_us)
            - F.unix_micros(F.col("latest_ts").cast("timestamp")),
        )
        .withColumn("staleness_minutes", F.expr("_us DIV 60000000"))
        .drop("_us")
    )


@query(
    "i15_state_islands",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN event_type = LAG(event_type)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 0 ELSE 1 END AS new_island
      FROM events
    ),
    islands AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(SUM(new_island) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island_id
      FROM flagged
    )
    SELECT user_id, island_id, event_type,
           COUNT(*) AS n_events,
           MIN(ts) AS island_start,
           MAX(ts) AS island_end
    FROM islands GROUP BY user_id, island_id, event_type
    HAVING COUNT(*) >= 2
    """,
)
def i15_state_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: contiguous runs of the SAME event_type per user
    (ordered by ts with event_id tiebreak), the classic
    change-detection shape CDC consumers use to collapse repeated
    states into intervals (the journal's SCD2 compaction is this exact
    computation over column values — streaming/cdc.py). Runs shorter
    than 2 events are dropped to keep the report at run-granularity.

    One shuffle on user_id serves both windows AND the final group-by
    (island_id is a function of the window ordering), so the plan is a
    single exchange + sort despite three logical steps."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_island",
        F.when(
            F.col("event_type") == F.lag("event_type").over(w), 0
        ).otherwise(1),
    )
    islands = flagged.withColumn(
        "island_id",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy("user_id", "island_id", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("island_start"),
            F.max("ts").alias("island_end"),
        )
        .filter(F.col("n_events") >= 2)
    )


@query(
    "i16_funnel_stages",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) FILTER (WHERE event_type = 'signup') AS t1
      FROM events GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND s1.t1 IS NOT NULL
        AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 3 DAY
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 3 DAY
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM s1 WHERE t1 IS NOT NULL) AS BIGINT)
               AS n_signup,
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_clicked_after,
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_purchased_after,
           (SELECT COUNT(*) FROM s3) * 1000000
               // (SELECT COUNT(*) FROM s1 WHERE t1 IS NOT NULL)
               AS conversion_ppm
    """,
)
def i16_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED FUNNEL analysis — signup -> first click strictly after it
    within three days -> first purchase within three days of that click —
    the product-analytics
    sequence query (and the event-ordering stress test for a CDC
    stream: correctness depends on event-time order, not arrival
    order). Stage timestamps are exact event-time minima; conversion is
    integer ppm (floor division, positive — no double rounding).

    Scale shape: three user-keyed aggregations, each a map-side-
    combinable MIN over a filtered pass, chained by broadcast-size
    per-user stage tables (stage cardinality <= users, shrinking every
    stage). No window over the raw stream and no per-user sort — the
    'first X after Y' recursion stays in aggregate space."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 3 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 3 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.agg(F.count("*").alias("n_signup"))
        .crossJoin(s2.agg(F.count("*").alias("n_clicked_after")))
        .crossJoin(s3.agg(F.count("*").alias("n_purchased_after")))
    )
    return counts.select(
        "n_signup",
        "n_clicked_after",
        "n_purchased_after",
        F.expr("n_purchased_after * 1000000 DIV n_signup").alias(
            "conversion_ppm"
        ),
    )


@query(
    "i17_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) // 7
                AS BIGINT) AS week_offset,
           COUNT(*) AS n_active
    FROM first_seen f JOIN activity a ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def i17_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT RETENTION matrix: users bucketed by first-seen ISO week,
    counted once per later week they were active — the
    (cohort, week-offset, actives) triangle every retention dashboard
    draws. Week offsets are exact integer day-differences of two
    Monday-truncated timestamps floor-divided by 7 (both engines
    truncate weeks to ISO Monday; no fractional-week doubles).

    Scale shape: one user-keyed MIN for cohorts, one DISTINCT projected
    to (user, week) — already tiny next to the raw stream — then a
    user-keyed join and a cohort-keyed count; activity is deduped
    BEFORE the join so the join input is bounded by users x weeks, not
    events."""
    ev = load_table(spark, sf_dir, "events")
    # date_trunc returns a TZ-aware timestamp even for NTZ input — cast
    # back so collect is process-TZ independent (the verify-skill trap;
    # session TZ is UTC so the round-trip is the wall-clock identity)
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts"))
        .cast("timestamp_ntz")
        .alias("cohort_week")
    )
    activity = ev.select(
        "user_id",
        F.date_trunc("week", F.col("ts"))
        .cast("timestamp_ntz")
        .alias("active_week"),
    ).distinct()
    return (
        first_seen.join(activity, "user_id")
        .select(
            "cohort_week",
            F.expr("datediff(active_week, cohort_week) DIV 7").alias(
                "week_offset"
            ),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
    )
