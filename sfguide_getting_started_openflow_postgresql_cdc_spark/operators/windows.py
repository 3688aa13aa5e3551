"""Window functions, sorts, top-k (SURVEY.md §2.E, §2.F).

The reference's windows are all aggregate-over-aggregate (% of total);
ranking windows are added for the top-k-per-group shape the LLM-pipeline
operators need. Scale note: `Window.partitionBy()` with no keys funnels
everything to one task — only ever applied AFTER aggregation has reduced
the data to group-cardinality rows, never on raw facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sfguide_getting_started_openflow_postgresql_cdc_spark.functions.shims import (
    decimal_sum,
    listagg_distinct_ordered,
    pct_of,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import query
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import load_table


@query(
    "e1_pct_of_total",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           COUNT(*) * 100.0 / NULLIF(SUM(COUNT(*)) OVER (), 0) AS pct
    FROM orders GROUP BY o_orderstatus
    """,
)
def e1_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(COUNT(*)) OVER () percent-of-total (reference:
    sql/2.verify_snapshot.sql:127; sql/4.analytics_queries.sql:36)."""
    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy())
    return counts.withColumn("pct", pct_of(F.col("n"), total))


@query(
    "e2_nested_agg_window",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) * 100.0
             / NULLIF(CAST(SUM(SUM(CAST(o_totalprice AS DECIMAL(38,4)))) OVER ()
                 AS DOUBLE), 0) AS revenue_pct
    FROM orders GROUP BY o_orderpriority
    """,
)
def e2_nested_agg_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(SUM(x)) OVER () — revenue share of total (reference:
    sql/4.analytics_queries.sql:228)."""
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(decimal_sum("o_totalprice").alias("revenue_dec"))
    )
    total = F.sum("revenue_dec").over(Window.partitionBy())
    return rev.select(
        "o_orderpriority",
        F.col("revenue_dec").cast("double").alias("revenue"),
        pct_of(F.col("revenue_dec").cast("double"), total.cast("double")).alias(
            "revenue_pct"
        ),
    )


@query(
    "e3_partitioned_window",
    oracle="""
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           COUNT(*) AS n_customers,
           COUNT(*) * 100.0
             / NULLIF(SUM(COUNT(*)) OVER (PARTITION BY n.n_name), 0)
             AS pct_within_nation
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, c.c_mktsegment
    """,
)
def e3_partitioned_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVER (PARTITION BY ...) share within a partition (reference:
    sql/4.analytics_queries.sql:298 % within specialization)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    counts = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_customers"))
    )
    within = F.sum("n_customers").over(Window.partitionBy("nation"))
    return counts.withColumn("pct_within_nation", pct_of(F.col("n_customers"), within))


@query(
    "e4_listagg_distinct",
    oracle="""
    SELECT o_orderstatus,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ', ')
               AS priorities
    FROM orders GROUP BY o_orderstatus
    """,
)
def e4_listagg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG(DISTINCT x, ', ') WITHIN GROUP (ORDER BY x) (reference:
    sql/4.analytics_queries.sql:37 time_slots). Composed as
    collect_set -> array_sort -> array_join; map-side partial agg keeps
    the shuffle payload at set-cardinality, not row-cardinality."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(listagg_distinct_ordered("o_orderpriority").alias("priorities"))
    )


@query(
    "f4_topk_global",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 10
    """,
)
def f4_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (reference: sql/2.verify_snapshot.sql:165-166 top
    patients by visits). Catalyst plans TakeOrderedAndProject — no full
    sort at scale. Tie broken by key for determinism."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(decimal_sum("o_totalprice").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


@query(
    "f6_topk_per_group",
    oracle="""
    SELECT c_mktsegment AS segment, o_orderkey, o_totalprice
    FROM (
        SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                  ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
)
def f6_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window — beyond the reference's surface
    (SURVEY.md §2.E notes ranking absent) but the workhorse of the
    similarity-search operators; registered as a first-class op."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("c_mktsegment").alias("segment"), "o_orderkey", "o_totalprice")
    )


@query(
    "e11_rank_distributions",
    oracle="""
    WITH r AS (
      SELECT o_totalprice,
             CAST(NTILE(10) OVER w AS BIGINT) AS decile,
             PERCENT_RANK() OVER w AS pr,
             CUME_DIST() OVER w AS cd
      FROM orders
      WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    )
    SELECT decile,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
               AS sum_price,
           MIN(pr) AS first_pct_rank,
           MAX(cd) AS last_cume_dist
    FROM r GROUP BY decile
    """,
)
def e11_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK / CUME_DIST distribution report (decile summary of
    order values) — the remaining SQL ranking-window family beyond
    ROW_NUMBER/RANK (e7) and NTILE (px9).

    Scale shape: a bare ``PERCENT_RANK() OVER (ORDER BY ...)`` is a
    single-partition sort (the d25 lesson), so all three functions are
    derived ARITHMETICALLY from one exact distributed global rank
    (functions/ranking.with_global_rank: range repartition +
    per-partition row numbers + broadcast prefix offsets). Under a
    TOTAL order (price, orderkey tiebreak) rank == row_number, so
    percent_rank = (r-1)/(n-1) and cume_dist = r/n — single IEEE
    divisions of exact integers, bit-identical to the engine builtins
    (the oracle runs the real NTILE/PERCENT_RANK/CUME_DIST to prove
    it). Every stage parallel; the driver sees only partition counts."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.functions.ranking import (
        ntile_from_rank,
        with_global_rank_n,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    # n comes from the rank pass's own partition-size collect (r11):
    # the previous separate orders.count() was a second full scan
    ranked, n = with_global_rank_n(
        orders, [F.col("o_totalprice"), F.col("o_orderkey")], rank_col="_grk"
    )
    r = F.col("_grk")
    per_row = ranked.select(
        "o_totalprice",
        ntile_from_rank(r, n, 10).alias("decile"),
        ((r - F.lit(1)).cast("double") / F.lit(float(n - 1))).alias("pr"),
        (r.cast("double") / F.lit(float(n))).alias("cd"),
    )
    return per_row.groupBy("decile").agg(
        F.count("*").alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        decimal_sum("o_totalprice").cast("double").alias("sum_price"),
        F.min("pr").alias("first_pct_rank"),
        F.max("cd").alias("last_cume_dist"),
    )


@query(
    "e12_value_windows",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) = 1
    """,
)
def e12_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE — the navigation trio over a
    full-partition frame (each customer's first, latest, and second
    order value), reported once per customer via their first order row.
    The frame is explicitly UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING:
    LAST_VALUE over the default frame (..CURRENT ROW) is the classic
    silent-wrong-answer trap — it returns the current row — and both
    engines agree only when the frame is spelled out. One shuffle on
    the customer key serves all four windows (same partitioning and
    ordering)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wr = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
            F.row_number().over(wr).alias("_rn"),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
