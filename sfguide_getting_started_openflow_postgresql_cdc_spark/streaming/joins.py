"""Stream-stream interval join with watermark-bounded state.

The reference pipeline joins replicated tables in batch; the streaming
counterpart a live deployment needs is correlating two EVENT streams —
e.g. "purchase within 30 minutes of the same user's click". Spark's
stream-stream inner join buffers both sides in the state store; the
watermarks plus the time-interval predicate are what let it EVICT
state: a row older than (other side's watermark - interval) can never
match again and is dropped.

Scale notes: state is keyed by the equality column (user_id), living
in the state store partitioned like the join shuffle. Without BOTH
watermarks and a bounded interval the state grows without limit — the
composition below refuses to run unbounded by construction.

Reference analog: the "recent activity correlation" queries of
sql/4.analytics_queries.sql (batch self-joins over time windows),
re-expressed as the incremental operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    interval_seconds: int = 1800,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Inner-join two event streams on ``key`` where the right event
    lands within ``[left_ts, left_ts + interval_seconds]``.

    ``left``/``right`` must already project distinct column names apart
    from ``key`` (rename before calling). Both sides get a watermark of
    ``watermark_delay`` on their timestamp column — required for state
    eviction in stream-stream joins.
    """
    # Watermarks demand TZ-aware TIMESTAMP; the engine's NTZ contract
    # stays intact because the session TZ is pinned UTC (loader.py), so
    # the cast is a type tag, not a value shift.
    lw = left.withColumn(left_ts, F.col(left_ts).cast("timestamp")).withWatermark(
        left_ts, watermark_delay
    )
    rw = right.withColumn(right_ts, F.col(right_ts).cast("timestamp")).withWatermark(
        right_ts, watermark_delay
    )
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {interval_seconds} SECONDS")
        )
    )
    return lw.join(rw, cond, "inner").drop(rw[key])
