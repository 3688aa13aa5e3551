"""Exact GLOBAL ranking without a single-partition sort.

A bare ``ROW_NUMBER() OVER (ORDER BY ...)`` moves the whole table
through one reducer — the plan shape that cannot scale (see
d25_top_percent's history). The classic distributed fix, implemented
here as a reusable primitive:

1. ``repartitionByRange`` on the order columns — each partition holds a
   contiguous, sorted-between-partitions slice (Spark samples range
   boundaries; the result is pinned with an eager localCheckpoint so
   the boundary draw cannot differ between the size job and the rank
   job).
2. per-partition ``ROW_NUMBER`` (parallel, partition-local),
3. one driver collect of the PARTITION SIZES (``num_partitions`` rows —
   not data) turned into prefix offsets, joined back as a broadcast.

global_rank = partition offset + local row number: exact, total, and
every stage parallel. NTILE/percentile/top-percent then become literal
arithmetic over the rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add an exact 1-based global ROW_NUMBER under ``order_cols``
    (must be a TOTAL order — include a tiebreaker) without ever
    single-partitioning the data. Returns a pinned (localCheckpointed)
    frame; input column set is preserved plus ``rank_col``."""
    return with_global_rank_n(df, order_cols, rank_col, num_partitions)[0]


def with_global_rank_n(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """:func:`with_global_rank` plus the TOTAL ROW COUNT for free: the
    partition-size collect already sums to it, so callers needing n
    (NTILE/percent_rank denominators) skip their own ``df.count()`` job
    — one less full scan of the upstream per query (r11, guide §1.2:
    don't recompute what an existing pass already knows)."""
    spark = df.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    rp = (
        df.repartitionByRange(parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin the sampled range boundaries
    )
    sizes = {
        r["_pid"]: r["c"]
        for r in rp.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    }
    if not sizes:
        empty = df.withColumn(rank_col, F.lit(None).cast("long")).filter(
            F.lit(False)
        )
        return empty, 0
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off = spark.createDataFrame(
        [(pid, o) for pid, o in offsets.items()], ["_pid", "_offset"]
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked = (
        rp.join(F.broadcast(off), "_pid")
        .withColumn(
            rank_col,
            (F.row_number().over(w).cast("long") + F.col("_offset")),
        )
        .drop("_pid", "_offset")
    )
    return ranked, acc


def ntile_from_rank(rank, n_rows: int, k: int):
    """Exact NTILE(k) bucket from a 1-based global rank over ``n_rows``
    rows — the standard remainder-to-first-buckets distribution both
    Spark and DuckDB implement. Pure literal arithmetic: pairs with
    ``with_global_rank`` so bucketing never needs the single-partition
    window."""
    base = n_rows // k
    rem = n_rows % k
    if base == 0:  # fewer rows than buckets: bucket == rank
        return rank.cast("long")
    cutoff = rem * (base + 1)
    return (
        F.when(rank <= cutoff, F.floor((rank - 1) / (base + 1)))
        .otherwise(rem + F.floor((rank - 1 - cutoff) / base))
        .cast("long")
        + F.lit(1)
    ).cast("long")
