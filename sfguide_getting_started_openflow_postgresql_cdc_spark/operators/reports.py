"""UNION ALL report queries (SURVEY.md §2.G, §2.D13) — the reference's
multi-table scalar-agg dashboards re-expressed with unionByName."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import query
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import load_table

_REPORT_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


@query(
    "g1_union_all_rowcounts",
    oracle="""
    SELECT 'region' AS table_name, COUNT(*) AS n_rows FROM region
    UNION ALL SELECT 'nation', COUNT(*) FROM nation
    UNION ALL SELECT 'customer', COUNT(*) FROM customer
    UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
    UNION ALL SELECT 'part', COUNT(*) FROM part
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    """,
)
def g1_union_all_rowcounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of scalar aggregates — the reference's golden row-count
    verification (sql/2.verify_snapshot.sql:19-35)."""
    parts = [
        load_table(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"), F.count("*").alias("n_rows")
        )
        for t in _REPORT_TABLES
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


@query(
    "g2_data_quality_nulls",
    oracle="""
    SELECT 'orders.o_custkey' AS check_name,
           COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_nulls FROM orders
    UNION ALL SELECT 'orders.o_orderdate',
           COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END) FROM orders
    UNION ALL SELECT 'lineitem.l_orderkey',
           COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) FROM lineitem
    UNION ALL SELECT 'customer.c_nationkey',
           COUNT(CASE WHEN c_nationkey IS NULL THEN 1 END) FROM customer
    """,
)
def g2_data_quality_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-check data-quality report (reference:
    sql/2.verify_snapshot.sql:85-119 — all counts must be 0)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    def null_count(df: DataFrame, col: str, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.when(F.col(col).isNull(), 1)).alias("n_nulls"),
        )

    parts = [
        null_count(orders, "o_custkey", "orders.o_custkey"),
        null_count(orders, "o_orderdate", "orders.o_orderdate"),
        null_count(lineitem, "l_orderkey", "lineitem.l_orderkey"),
        null_count(customer, "c_nationkey", "customer.c_nationkey"),
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)
