"""Bucketed-table layout for co-located (shuffle-free) joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides on the join key. Spark's bucketed tables remove it: writing both
tables ``bucketBy(n, key)`` (plus ``sortBy`` for merge-ready runs)
pre-partitions the data ON DISK by ``hash(key) % n``, and a join on
that key reads matching buckets pairwise — the plan contains NO
Exchange on either side (asserted in tests/test_plans.py).

This is the batch-layout twin of the CDC replica's ``_CDC_BUCKET``
scheme (streaming/cdc.py) — same idea, expressed through the Spark
catalog so Catalyst can exploit it automatically.

Sizing: choose ``n_buckets`` so one bucket of the LARGER table is a
few hundred MB (100 TB fact -> tens of thousands of buckets). Both
sides must use the SAME bucket count or Spark re-shuffles the smaller
side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a catalog-managed bucketed parquet table."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys. With
    matching layouts Catalyst plans a SortMergeJoin whose children are
    bare bucketed scans — zero Exchange operators."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
