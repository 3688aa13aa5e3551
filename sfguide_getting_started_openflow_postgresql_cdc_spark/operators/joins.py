"""Joins (SURVEY.md §2.C) — fact⋈dim shapes from the reference mapped onto
orders⋈customer⋈nation (FIXTURES.md §C role mapping).

Scale notes: dimension tables (nation 25, region 5, customer ~1% of fact)
are broadcast explicitly — at 100 TB the fact side never shuffles for
these joins. Aggregations after a broadcast join keep the fact table's
partitioning; Catalyst plans partial (map-side) aggregation before the
single shuffle on the group keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.functions.shims import (
    decimal_sum,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import query
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import load_table


@query(
    "flagship_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT c.c_custkey) AS n_customers,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
           CAST(MIN(CAST(o.o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS min_order,
           CAST(MAX(CAST(o.o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS max_order
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def flagship_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query — the engine's analog of the reference's verified
    'revenue by doctor' query (semantic model yaml:621-648: join + group +
    SUM/MIN/MAX + COUNT DISTINCT). Exercises scan, broadcast join, partial
    agg, shuffle, final agg in one plan.

    Both dims are broadcast: the 100 TB fact scan joins map-side with zero
    fact shuffle; the only exchange is on the 25 nation group keys.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    price = F.col("o_totalprice").cast("decimal(38,4)")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
            decimal_sum("o_totalprice").cast("double").alias("revenue"),
            F.min(price).cast("double").alias("min_order"),
            F.max(price).cast("double").alias("max_order"),
        )
        .orderBy(F.col("revenue").desc_nulls_last())
    )


@query(
    "c1_join_2way_agg",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def c1_join_2way_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-way inner equi-join + agg (reference:
    sql/4.analytics_queries.sql:199 doctors⋈visits revenue)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            decimal_sum("o_totalprice").cast("double").alias("revenue"),
        )
    )


@query(
    "c3_left_join_count",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def c3_left_join_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN preserving unmatched dim rows; COUNT(col) skips the nulls
    (reference: sql/4.analytics_queries.sql:334,364 patients with zero
    visits).

    Aggregate-below-join rewrite: COUNT the fact per key FIRST, then left
    join the (key, count) aggregate — the join shuffle carries one row
    per customer instead of one per order, and unmatched customers take
    ``coalesce(n, 0)`` (identical semantics: COUNT(col) over the
    null-extended rows of a left join is 0). At 100 TB this is the
    difference between shuffling the fact table and shuffling a key list."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_key = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("o_orderkey").alias("n"))
    )
    return customer.join(
        per_key, customer.c_custkey == per_key.o_custkey, "left"
    ).select("c_custkey", F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_orders"))


@query(
    "c4_left_join_residual_on",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_recent_orders
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey
     AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY c.c_custkey
    """,
)
def c4_left_join_residual_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN with a non-key residual condition INSIDE the ON clause —
    semantics differ from a WHERE filter: left rows survive (reference:
    sql/4.analytics_queries.sql:163-165,179-181).

    Same aggregate-below-join rewrite as c3: a right-side-only residual
    ON predicate is equivalent to filtering the fact BEFORE the per-key
    count (rows failing it null-extend, contributing 0 — exactly what a
    missing key contributes after the rewrite). The filter then pushes
    into the parquet scan, which the ON-clause form forbids."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_key = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
        )
        .groupBy("o_custkey")
        .agg(F.count("o_orderkey").alias("n"))
    )
    return customer.join(
        per_key, customer.c_custkey == per_key.o_custkey, "left"
    ).select(
        "c_custkey",
        F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_recent_orders"),
    )


@query(
    "c5_join_derived_table",
    oracle="""
    WITH customer_orders AS (
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS lifetime_value
        FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_name, co.n_orders, co.lifetime_value
    FROM customer_orders co
    JOIN customer c ON co.o_custkey = c.c_custkey
    WHERE co.n_orders >= 12
    """,
)
def c5_join_derived_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join against a CTE/derived aggregate (reference:
    sql/4.analytics_queries.sql:346 JOIN patient_visits pv)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            decimal_sum("o_totalprice").cast("double").alias("lifetime_value"),
        )
        .filter(F.col("n_orders") >= 12)
    )
    return per_cust.join(
        F.broadcast(customer), per_cust.o_custkey == customer.c_custkey
    ).select("c_custkey", "c_name", "n_orders", "lifetime_value")


@query(
    "c6_semi_join",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
    GROUP BY l_returnflag
    """,
)
def c6_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) -> left-semi join (reference:
    sql/3.live_appointments.sql:79-84 victim-key subselects)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    finished = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    return (
        lineitem.join(
            finished, lineitem.l_orderkey == finished.o_orderkey, "left_semi"
        )
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_lines"))
    )


@query(
    "c7_anti_join",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def c7_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> left-anti join (customers with no URGENT orders).
    Not in the reference's surface (SURVEY.md §2.C 'not present') but
    free via Catalyst and required by the CDC merge internals; exposed
    as a first-class operator. The correlated subquery is FILTERED
    (urgent orders only) because in the synthetic corpus every customer
    has at least one order — the unfiltered anti join returned 0 rows
    at every scale, a VACUOUS oracle match (r9 non-empty gate; ~13% of
    customers qualify at sf0.001/0.01/0.1). The filter lands below the
    anti join's right side, so the scan prunes before the shuffle."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    )
