"""Projections, filters, predicates, scalar expressions (SURVEY.md §2.B, §2.H).

Each builder is the Spark-first expression of a reference query shape;
reference citations are on each function. All filters/projections are
declarative so Catalyst pushes them into the parquet scan (PushedFilters /
ReadSchema) — at 100 TB these queries read only the referenced columns
and skip row groups via min/max stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.functions.shims import (
    sf_dayname,
    sf_dayofweek,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import (
    AS_OF_DATE,
    query,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import load_table


@query(
    "b1_project_filter",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer WHERE c_acctbal > 1000.0
    """,
)
def b1_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection + range predicate (reference:
    sql/2.verify_snapshot.sql:61-72 patient demographics projection)."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .filter(F.col("c_acctbal") > 1000.0)
    )


@query("b2_select_star", oracle="SELECT * FROM region")
def b2_select_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * sample (reference: sql/2.verify_snapshot.sql:55,58)."""
    return load_table(spark, sf_dir, "region")


@query(
    "b3_alias_expr",
    oracle="""
    SELECT c_custkey AS customer_id, c_acctbal * 2 AS acctbal_x2
    FROM customer WHERE c_custkey <= 500
    """,
)
def b3_alias_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aliasing + arithmetic projection (reference:
    sql/2.verify_snapshot.sql:22,143)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 500)
        .select(
            F.col("c_custkey").alias("customer_id"),
            (F.col("c_acctbal") * 2).alias("acctbal_x2"),
        )
    )


@query(
    "b5_in_list",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def b5_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate (reference: sql/4.analytics_queries.sql:60,90
    status IN ('completed','in_progress'))."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


@query(
    "b6_date_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-03-01 00:00:00'
    """,
)
def b6_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range predicate (reference: sql/4.analytics_queries.sql:92,
    107-108 appointment_date windows)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-03-01 00:00:00").cast("timestamp_ntz"))
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


@query(
    "b7_null_predicate",
    oracle="""
    SELECT event_id, (props IS NULL) AS props_missing
    FROM events WHERE event_id <= 2000 AND props IS NOT NULL
    """,
)
def b7_null_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL predicates (reference:
    sql/2.verify_snapshot.sql:93-117 data-quality null checks)."""
    return (
        load_table(spark, sf_dir, "events")
        .filter((F.col("event_id") <= 2000) & F.col("props").isNotNull())
        .select("event_id", F.col("props").isNull().alias("props_missing"))
    )


@query(
    "b8_column_inequality",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
    FROM lineitem WHERE l_returnflag <> l_linestatus
    """,
)
def b8_column_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column != column (reference: sql/4.analytics_queries.sql:91
    created_at != updated_at -> 'modified rows')."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") != F.col("l_linestatus"))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
    )


@query(
    "b10_compound_predicate",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice > 200000.0)
       OR (o_orderpriority = '1-URGENT' AND o_totalprice < 50000.0)
    """,
)
def b10_compound_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND/OR predicate (reference:
    sql/4.analytics_queries.sql:402-403,414-415)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000.0))
        | ((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") < 50000.0))
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@query(
    "h1_string_concat",
    oracle="""
    SELECT c_custkey, c_name || ' [' || c_mktsegment || ']' AS customer_label
    FROM customer WHERE c_custkey <= 200
    """,
)
def h1_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String concatenation || (reference: sql/2.verify_snapshot.sql:143
    first_name || ' ' || last_name)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select(
            "c_custkey",
            F.concat(
                F.col("c_name"), F.lit(" ["), F.col("c_mktsegment"), F.lit("]")
            ).alias("customer_label"),
        )
    )


@query(
    "h4_case_bucket",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000.0  THEN 'small'
                WHEN o_totalprice < 150000.0 THEN 'medium'
                WHEN o_totalprice < 300000.0 THEN 'large'
                ELSE 'jumbo' END AS price_band
    FROM orders
    """,
)
def h4_case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched CASE bucketing (reference: sql/2.verify_snapshot.sql:190-196
    age_group buckets)."""
    p = F.col("o_totalprice")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(p < 50000.0, "small")
        .when(p < 150000.0, "medium")
        .when(p < 300000.0, "large")
        .otherwise("jumbo")
        .alias("price_band"),
    )


@query(
    "h5_simple_case",
    oracle="""
    SELECT CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              WHEN 'P' THEN 'pending'
                              ELSE 'unknown' END AS status_name,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def h5_simple_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple CASE expr WHEN v (reference: sql/0.init_healthcare.sql:
    246-262 status-name lookups)."""
    s = F.col("o_orderstatus")
    name = (
        F.when(s == "F", "finished")
        .when(s == "O", "open")
        .when(s == "P", "pending")
        .otherwise("unknown")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(name.alias("status_name"))
        .agg(F.count("*").alias("n"))
    )


@query(
    "h13_compose_timestamp",
    oracle="""
    SELECT o_orderkey,
           strptime(strftime(o_orderdate, '%Y-%m-%d') || ' 12:30:00',
                    '%Y-%m-%d %H:%M:%S') AS order_noon
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def h13_compose_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TO_TIMESTAMP over composed date+time strings (reference:
    sql/4.analytics_queries.sql:54 appointment_date || appointment_time
    — the engine's TIME-as-string emulation path)."""
    composed = F.concat(
        F.date_format("o_orderdate", "yyyy-MM-dd"), F.lit(" 12:30:00")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.to_timestamp(composed).cast("timestamp_ntz").alias("order_noon"),
        )
    )


@query(
    "h6_cast_to_date",
    oracle="""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_day
    FROM orders WHERE o_orderkey <= 4000
    """,
)
def h6_cast_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """::DATE cast (reference: sql/0.init_healthcare.sql:237-240)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 4000)
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("order_day"))
    )


@query(
    "h8_date_arithmetic",
    oracle=f"""
    SELECT o_orderkey, o_orderdate
    FROM orders
    WHERE o_orderdate >= CAST(DATE '{AS_OF_DATE}' - INTERVAL 400 DAY AS TIMESTAMP)
    """,
)
def h8_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """now-relative date arithmetic with pinned AS_OF (reference:
    sql/4.analytics_queries.sql:92 DATEADD(day, -30, CURRENT_DATE))."""
    cutoff = F.date_sub(F.lit(AS_OF_DATE).cast("date"), 400).cast("timestamp_ntz")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= cutoff)
        .select("o_orderkey", "o_orderdate")
    )


@query(
    "h12_to_char_month",
    oracle="""
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS order_month
    FROM orders WHERE o_orderkey <= 4000
    """,
)
def h12_to_char_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TO_CHAR(date,'YYYY-MM') (reference: sql/4.analytics_queries.sql:252)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 4000)
        .select(
            "o_orderkey", F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
        )
    )


@query(
    "h15_dayname_dayofweek",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%a') AS order_dayname,
           CAST(dayofweek(o_orderdate) AS INT) AS order_dow
    FROM orders WHERE o_orderkey <= 4000
    """,
)
def h15_dayname_dayofweek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAYNAME / DAYOFWEEK with Snowflake numbering Sun=0..Sat=6
    (reference: sql/4.analytics_queries.sql:137-138)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 4000)
        .select(
            "o_orderkey",
            sf_dayname(F.col("o_orderdate")).alias("order_dayname"),
            sf_dayofweek(F.col("o_orderdate")).alias("order_dow"),
        )
    )


@query(
    "h16_modulo",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey % 7 AS BIGINT) AS key_bucket
    FROM lineitem WHERE l_orderkey <= 4000
    """,
)
def h16_modulo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modulo arithmetic (reference: sql/3.live_appointments.sql:138,146)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 4000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_bucket"),
        )
    )


@query(
    "h31_array_hof",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT)
               AS n_positive,
           CAST(len(list_filter(embedding, x -> abs(x) > 0.5)) AS BIGINT)
               AS n_large,
           list_max(embedding) AS max_val,
           CAST(list_indexof(embedding, list_max(embedding)) AS BIGINT)
               AS max_pos
    FROM embeddings
    """,
)
def h31_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (lambda filter / reduce family) —
    per-vector sign and magnitude profiles over the embedding column.
    All outputs are exact (integer counts, the float32 max itself, its
    1-based position), so the HOF semantics — not float accumulation —
    are what the oracle checks. Catalyst interprets HOF lambdas
    per-element (no codegen); for counts like these that is still far
    cheaper than shipping rows to Python, and the scan stays
    column-pruned to (vec_id, embedding)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > F.lit(0.0)))
        .cast("long")
        .alias("n_positive"),
        F.size(F.filter("embedding", lambda x: F.abs(x) > F.lit(0.5)))
        .cast("long")
        .alias("n_large"),
        F.array_max("embedding").alias("max_val"),
        F.array_position("embedding", F.array_max("embedding")).alias(
            "max_pos"
        ),
    )
