"""Registry wiring SURVEY.md §2 operators to the driver contract.

Every operator is registered as ``(spark, sf_dir) -> DataFrame`` plus an
equivalent ANSI-SQL oracle string runnable by DuckDB on the same parquet.
Column names/types are aligned on both sides — the driver's comparator
sorts columns by name and hashes values.

Determinism rules enforced across the inventory:
- no bare LIMIT without a total ORDER BY (ties broken by a key column);
- double SUM/AVG routed through exact decimal accumulation
  (``functions.shims.decimal_sum``) so results are independent of
  partitioning / accumulation order — mandatory at cluster scale;
- all "now"-relative predicates use pinned AS_OF constants, never
  current_date() (SURVEY.md §4 "Deterministic CURRENT_DATE").
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Pinned "now" anchors (see module docstring). Orders/lineitem span
# 1995-01..2001-08; events span 2024-01.
AS_OF_DATE = "2001-09-02"
AS_OF_EVENT_TS = "2024-01-31 00:00:00"


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder; ``oracle`` is the DuckDB twin (omit only
    for genuinely non-SQL-expressible operators -> rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
