"""Hive-style partitioned layout — the other on-disk lever next to
bucketing (sources/bucketed.py).

At 100 TB, a predicate on a low-cardinality column (lang, event day,
source) should not SCAN at all: writing the table
``partitionBy(col)`` turns that predicate into directory pruning —
the files of non-matching partitions are never opened, visible in the
plan as ``PartitionFilters`` (asserted in tests/test_partitioned.py).
Joins get the same effect at runtime via Dynamic Partition Pruning:
a filtered dimension side generates a runtime IN-filter
(``dynamicpruning`` subquery in the plan) that prunes the fact's
partitions before the scan.

Sizing: partition by columns whose cardinality keeps individual
partitions in the hundreds-of-MB-to-GB range (lang, date). NEVER by a
high-cardinality key — millions of tiny directories kill the file
listing; that's what bucketing is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, *cols: str, mode: str = "overwrite"
) -> None:
    """Write ``df`` as a directory-partitioned parquet dataset."""
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset (partition columns come back typed
    from directory names; basePath keeps them when globbing)."""
    return spark.read.option("basePath", path).parquet(path)
