"""Aggregations (SURVEY.md §2.D) plus date/diff scalar shims used inside
aggregates (§2.H).

All double measures accumulate via exact decimal (`decimal_sum`) so results
are independent of partition count and merge order — the property that
keeps these queries reproducible on a 1000-executor cluster. Grouped
aggregation is Catalyst's partial->exchange->final HashAggregate; nothing
custom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.functions.shims import (
    decimal_avg,
    decimal_sum,
    nullif_zero,
    sf_datediff_year,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import (
    AS_OF_DATE,
    query,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import load_table


# d8/d16 registered first in this module: both carry round-2 oracle
# fixes (BIGINT cast / empty-cell coalesce) and need fresh driver
# evidence ahead of the long-green d* family (see operators/__init__).


@query(
    "d8_conditional_sum",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_finished,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_open,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pending,
           COUNT(*) AS n_total
    FROM orders GROUP BY o_orderpriority
    """,
)
def d8_conditional_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(CASE WHEN...1 ELSE 0) status matrix (reference:
    sql/2.verify_snapshot.sql:147-148,260-264). The oracle casts each sum
    to BIGINT: DuckDB sums integers into HUGEINT, which pandas
    materializes as float64 and dtype-sensitive comparators then reject
    against Spark's int64."""
    s = F.col("o_orderstatus")
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(s == "F", 1).otherwise(0)).alias("n_finished"),
            F.sum(F.when(s == "O", 1).otherwise(0)).alias("n_open"),
            F.sum(F.when(s == "P", 1).otherwise(0)).alias("n_pending"),
            F.count("*").alias("n_total"),
        )
    )


@query(
    "d16_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def d16_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: status columns per priority. Spark's ``.pivot`` with an
    explicit value list compiles to the same conditional-agg plan as the
    manual CASE matrix (d8) — explicit values avoid the extra distinct
    scan a dynamic pivot needs. Empty (priority, status) cells come back
    NULL from ``.pivot().count()`` while the oracle's COUNT(CASE) yields
    0 — coalesce so a dataset with a missing combination still matches."""
    pivoted = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return pivoted.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0).cast("long")).alias(c) for c in ("F", "O", "P")],
    )


@query(
    "d1_global_agg",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS total_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
               / COUNT(l_extendedprice) AS avg_price,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship
    FROM lineitem
    """,
)
def d1_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped COUNT/SUM/AVG/MIN/MAX in one pass (reference:
    sql/2.verify_snapshot.sql:225-231)."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        decimal_sum("l_quantity").cast("double").alias("total_qty"),
        decimal_avg("l_extendedprice").alias("avg_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@query(
    "d2_groupby_single",
    oracle="SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus",
)
def d2_groupby_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY one key (reference: sql/2.verify_snapshot.sql:128-129
    appointments by status)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


@query(
    "d3_tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(4,2))
                    * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE)
               / COUNT(l_quantity) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def d3_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key GROUP BY with stacked measures — the classic pricing
    summary (reference shape: sql/4.analytics_queries.sql:200,245
    multi-attribute revenue rollups)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-06-01 00:00:00").cast("timestamp_ntz")
    )
    # Money columns are 2-decimal by contract: casting the raw doubles to
    # decimal is value-preserving, and the products then stay EXACT — no
    # engine-dependent rounding of computed doubles (see shims docstring).
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_price = price * (1 - F.col("l_discount")).cast("decimal(4,2)")
    charge = disc_price * (1 + F.col("l_tax")).cast("decimal(4,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        decimal_sum("l_quantity").cast("double").alias("sum_qty"),
        decimal_sum("l_extendedprice").cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        decimal_avg("l_quantity").alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


@query(
    "d4_groupby_expression",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    """,
)
def d4_groupby_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY computed expression (reference:
    sql/2.verify_snapshot.sql:199 age_group; sql/4.analytics_queries.sql:131)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count("*").alias("n_orders"),
            decimal_sum("o_totalprice").cast("double").alias("revenue"),
        )
    )


@query(
    "d6_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def d6_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) (reference: sql/4.analytics_queries.sql:161,
    175 unique patients). Catalyst plans expand+two-phase agg; at 100 TB
    prefer approx_count_distinct when 2% error is acceptable."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "d9_count_case_no_else",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           COUNT(CASE WHEN o_totalprice > 100000.0 THEN 1 END) AS n_big,
           COUNT(*) AS n_total
    FROM orders GROUP BY 1
    """,
)
def d9_count_case_no_else(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(CASE WHEN ... THEN 1 END) — null-skipping count (reference:
    sql/4.analytics_queries.sql:70-73)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count(F.when(F.col("o_totalprice") > 100000.0, 1)).alias("n_big"),
            F.count("*").alias("n_total"),
        )
    )


@query(
    "d10_rate_avg_case",
    oracle="""
    SELECT l_linestatus,
           SUM(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END)
               / COUNT(*) AS return_rate
    FROM lineitem GROUP BY l_linestatus
    """,
)
def d10_rate_avg_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate via AVG(CASE...1.0/0.0) (reference:
    sql/4.analytics_queries.sql:127-128,140 no-show rate). Sum of 0/1
    doubles is exact, so the rate is order-independent."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            (
                F.sum(F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0))
                / F.count("*")
            ).alias("return_rate")
        )
    )


@query(
    "d11_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
    """,
)
def d11_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — post-aggregation filter (reference:
    sql/4.analytics_queries.sql:183,323)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "d14_exact_percentiles",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def d14_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90). Both engines use
    linear interpolation over the sorted values, so results agree
    bit-for-bit. At 100 TB prefer ``approx_percentile`` (t-digest sketch,
    no global sort) when 1% error is acceptable — kept exact here for the
    oracle gate."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("median_price"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90_price"),
            F.count("*").alias("n"),
        )
    )


@query(
    "h19_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events WHERE event_id <= 3000
    """,
)
def h19_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events props payload — beyond the
    reference's surface (no JSON in its schema) but table stakes for an
    event-stream warehouse."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") <= 3000)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        )
    )


@query("d15_approx_sketches")  # rows-only: sketch results are engine-specific
def d15_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB variants of D6/D14: HyperLogLog++ distinct counts
    (~2% default error, constant memory) and t-digest percentiles (no
    global sort). No cross-engine oracle — sketch internals differ — so
    accuracy is asserted against the exact operators in tests
    (tests/test_approx.py) instead."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
            F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias(
                "approx_median_price"
            ),
            F.count("*").alias("n"),
        )
    )


@query(
    "h2_h3_round_nullif",
    oracle="""
    SELECT o_orderstatus,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,4))), 2) AS DOUBLE)
               AS revenue_rounded,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
               / NULLIF(COUNT(*), 0) AS avg_order_value
    FROM orders GROUP BY o_orderstatus
    """,
)
def h2_h3_round_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUND + NULLIF div-by-zero guard (reference:
    sql/2.verify_snapshot.sql:239; sql/4.analytics_queries.sql:117-118)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(decimal_sum("o_totalprice"), 2)
            .cast("double")
            .alias("revenue_rounded"),
            (
                decimal_sum("o_totalprice").cast("double")
                / nullif_zero(F.count("*"))
            ).alias("avg_order_value"),
        )
    )


@query(
    "h10_datediff_year",
    oracle=f"""
    SELECT CAST(year(DATE '{AS_OF_DATE}') - year(o_orderdate) AS INT) AS years_ago,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def h10_datediff_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake DATEDIFF(year) semantics = calendar-year difference
    (reference: sql/2.verify_snapshot.sql:191-194 patient age)."""
    as_of = F.lit(AS_OF_DATE).cast("date")
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(sf_datediff_year(F.col("o_orderdate"), as_of).alias("years_ago"))
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "h11_timestampdiff_minute",
    oracle="""
    SELECT CAST(date_diff('minute', date_trunc('day', ts), ts) // 60 AS BIGINT)
               AS hour_of_day,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def h11_timestampdiff_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMPDIFF(MINUTE,...) truncation semantics (reference:
    sql/4.analytics_queries.sql:53-55 wait-time minutes)."""
    ev = load_table(spark, sf_dir, "events")
    mins = (
        (F.unix_timestamp("ts") - F.unix_timestamp(F.date_trunc("day", F.col("ts"))))
        / 60
    ).cast("long")
    return (
        ev.groupBy(F.floor(mins / 60).alias("hour_of_day"))
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "h14_date_trunc_hour",
    oracle="""
    SELECT date_trunc('hour', ts) AS event_hour,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def h14_date_trunc_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE_TRUNC('HOUR') histogram (reference:
    sql/4.analytics_queries.sql:422-430 hourly update pattern)."""
    return (
        load_table(spark, sf_dir, "events")
        # date_trunc returns a TZ-aware timestamp even on NTZ input; cast
        # back so collected values stay process-TZ-independent (UTC pinned).
        .groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("event_hour")
        )
        .agg(
            F.count("*").alias("n_events"),
            decimal_sum("value").cast("double").alias("total_value"),
        )
    )


@query(
    "d29_modern_aggregates",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT_IF(o_totalprice > 100000) AS BIGINT) AS n_big,
           BOOL_AND(o_totalprice > 0) AS all_positive,
           BOOL_OR(o_orderstatus = 'F') AS any_finished,
           MAX_BY(o_orderdate, o_orderkey) AS latest_keyed_date,
           MIN_BY(o_orderdate, o_orderkey) AS first_keyed_date
    FROM orders GROUP BY o_orderpriority
    """,
)
def d29_modern_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern conditional/selector aggregate family: COUNT_IF,
    BOOL_AND/BOOL_OR, MAX_BY/MIN_BY — one pass, all map-side
    combinable. Determinism: MAX_BY/MIN_BY select by the UNIQUE
    o_orderkey, so there is no tie for the engines to break
    differently (selecting by a non-unique measure is the documented
    nondeterminism trap — same reason ORDER BY always carries a key
    tiebreaker here)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.max_by("o_orderdate", "o_orderkey").alias("latest_keyed_date"),
        F.min_by("o_orderdate", "o_orderkey").alias("first_keyed_date"),
    )
