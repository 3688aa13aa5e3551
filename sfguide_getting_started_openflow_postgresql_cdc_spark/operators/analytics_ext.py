"""Extended analytics operators beyond the reference's own inventory
(SURVEY.md §2 families E/D/C/G/H widened, plus training-data pipeline
ops px2/px3 and range similarity search sim5).

These cover the window-navigation, frame, ranking, grouping-set, set-op,
correlated-subquery, and pattern-match shapes a user migrating a real
warehouse workload expects, expressed Spark-first, each with a DuckDB
oracle twin.

Determinism notes (CLAUDE.md / oracle-parity-playbook):
- every window has a TOTAL order (ties broken by a key column);
- double measures accumulate via value-preserving decimal casts of RAW
  columns; products are computed in decimal, never cast after a double
  multiply (round-half ties);
- the corr coefficient is a FIXED double expression tree over exact
  decimal sums — each IEEE op is correctly rounded, so Spark and DuckDB
  produce bit-identical doubles;
- md5-derived hashes are the portable split/sample primitive (identical
  hex everywhere; 15 hex digits -> BIGINT stays positive).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sfguide_getting_started_openflow_postgresql_cdc_spark.functions.shims import (
    decimal_sum,
    seconds_to_time,
    time_to_seconds,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import query
from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.similarity import (
    arrow_dot,
    arrow_norm,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import load_table


def _md5_mod(col: Column, m: int) -> Column:
    """Portable deterministic hash bucket: first 15 md5 hex digits (60
    bits, always positive) mod m — identical in DuckDB via
    ``('0x' || substr(md5(x),1,15))::BIGINT % m``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % m


def _md5_mod_sql(expr: str, m: int) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT % {m})"


# --------------------------------------------------------------------------
# E family: window navigation, frames, ranking
# --------------------------------------------------------------------------


@query(
    "e5_lag_lead",
    oracle="""
    SELECT user_id, event_id, event_type,
           LAG(event_type)  OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           date_diff('second', LAG(ts) OVER w, ts) AS secs_since_prev
    FROM events
    WHERE user_id < 100
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def e5_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD navigation per user with a total order (ts, event_id).
    Scale: partitioned window over the user key — shuffles once by
    user_id, then each partition sorts locally; no global sort."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts))
        .cast("long")
        .alias("secs_since_prev"),
    )


@query(
    "e6_moving_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS trailing3_spend
    FROM orders WHERE o_custkey < 200
    """,
)
def e6_moving_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame moving sum (trailing 3 orders per customer). The frame
    sums at most 3 exact decimals — order-independent by construction."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("trailing3_spend"),
        )
    )


@query(
    "e7_rank_functions",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             RANK()       OVER w AS bal_rank,
             DENSE_RANK() OVER w AS bal_dense_rank,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn,
             CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                                 ORDER BY c_acctbal DESC, c_custkey) AS INT)
                 AS quartile
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
    ) WHERE rn <= 20
    """,
)
def e7_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / ROW_NUMBER / NTILE per segment. RANK ties on
    the bare sort key are deterministic (equal keys -> equal rank);
    ROW_NUMBER and NTILE get a total order."""
    by_bal = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    total = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.rank().over(by_bal).alias("bal_rank"),
            F.dense_rank().over(by_bal).alias("bal_dense_rank"),
            F.row_number().over(total).alias("rn"),
            F.ntile(4).over(total).alias("quartile"),
        )
        .filter(F.col("rn") <= 20)
    )


@query(
    "e8_running_total",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_orderpriority
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING)
                AS DOUBLE) AS running_spend
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-07-01' AND o_orderdate < TIMESTAMP '1998-08-01'
    """,
)
def e8_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative running total per priority. ROWS UNBOUNDED PRECEDING
    over exact decimals: every prefix sum is exact, so the running
    value is identical regardless of physical accumulation order."""
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1998-07-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-08-01").cast("timestamp_ntz"))
        )
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("running_spend"),
        )
    )


# --------------------------------------------------------------------------
# D family: grouping sets, exact statistical moments
# --------------------------------------------------------------------------


@query(
    "d17_rollup",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region,
           COALESCE(n_name, 'ALL') AS nation,
           COUNT(c_custkey) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def d17_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — nation subtotals, region subtotals, grand
    total in one pass (Spark plans a single Expand + aggregate; no
    re-scan per level). NULL group keys are tagged 'ALL' rather than
    exposing engine-specific grouping-id encodings."""
    cust = load_table(spark, sf_dir, "customer")
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    reg = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
            "total_bal",
        )
    )


@query(
    "d18_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def d18_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE — all 4 grouping sets in one Expand+aggregate."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


@query(
    "d19_exact_corr_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             -- width 19 forces int128 physical storage: DuckDB multiplies
             -- int64-backed (width<=18) decimals without widening and
             -- overflows; 19+19=38 stays within the width cap. Values are
             -- exact on both sides, so Spark may size widths differently.
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(19,2)) AS dsq,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(19,2)) AS dsp,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(19,4)) AS dsqq,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(19,4)) AS dspp,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(19,4)) AS dsqp
      FROM lineitem GROUP BY l_returnflag
    ),
    x AS (
      -- decimal->double via VARCHAR: DuckDB's direct cast converts the
      -- int128 raw then multiplies by the scale factor (two roundings,
      -- off-by-one-ulp when the raw integer exceeds 2^53); strtod is
      -- correctly rounded, matching Spark's BigDecimal.doubleValue().
      SELECT l_returnflag, n,
             CAST(CAST(dsq AS VARCHAR) AS DOUBLE) AS sq,
             CAST(CAST(dsp AS VARCHAR) AS DOUBLE) AS sp,
             CAST(CAST(dsqq AS VARCHAR) AS DOUBLE) AS sqq,
             CAST(CAST(dspp AS VARCHAR) AS DOUBLE) AS spp,
             CAST(CAST(dsqp AS VARCHAR) AS DOUBLE) AS sqp,
             CAST(CAST(CAST(n AS DECIMAL(19,0)) * dsqp - dsq * dsp AS VARCHAR)
                  AS DOUBLE) AS num,
             CAST(CAST(CAST(n AS DECIMAL(19,0)) * dsqq - dsq * dsq AS VARCHAR)
                  AS DOUBLE) AS den_q,
             CAST(CAST(CAST(n AS DECIMAL(19,0)) * dspp - dsp * dsp AS VARCHAR)
                  AS DOUBLE) AS den_p
      FROM m
    )
    SELECT l_returnflag, n, sq, sp, sqq, spp, sqp,
           num / sqrt(den_q * den_p) AS corr_qty_price
    FROM x
    """,
)
def d19_exact_corr_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from EXACT decimal moments. Built-in
    ``corr()`` accumulates doubles in partition order — nondeterministic
    on a cluster — so the moments are exact decimal sums with products
    taken in decimal. The covariance numerator/denominators are ALSO
    computed exactly in decimal: ``a*b - c*d`` in double is
    FMA-contractable, and engines compiled with contraction enabled
    round differently (observed one-ulp drift at sf0.001). Only the
    final divide / multiply / sqrt run in double — each a single
    correctly-rounded IEEE op with no contraction site, so the
    coefficient is bit-identical on any engine. The decimal widths are
    sized so every intermediate stays inside 38 digits at 100 TB row
    counts (widths carry ~1e21 exactly). Map-side partial aggregation
    still applies — one shuffle of 5 decimals per group."""
    li = load_table(spark, sf_dir, "lineitem")
    dq = F.col("l_quantity").cast("decimal(18,2)")
    dp = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dq).cast("decimal(18,2)").alias("dsq"),
        F.sum(dp).cast("decimal(18,2)").alias("dsp"),
        F.sum(dq * dq).cast("decimal(18,4)").alias("dsqq"),
        F.sum(dp * dp).cast("decimal(22,4)").alias("dspp"),
        F.sum(dq * dp).cast("decimal(20,4)").alias("dsqp"),
    )
    nd = F.col("n").cast("decimal(10,0)")
    x = m.select(
        "l_returnflag",
        "n",
        F.col("dsq").cast("double").alias("sq"),
        F.col("dsp").cast("double").alias("sp"),
        F.col("dsqq").cast("double").alias("sqq"),
        F.col("dspp").cast("double").alias("spp"),
        F.col("dsqp").cast("double").alias("sqp"),
        (nd * F.col("dsqp") - F.col("dsq") * F.col("dsp"))
        .cast("double")
        .alias("num"),
        (nd * F.col("dsqq") - F.col("dsq") * F.col("dsq"))
        .cast("double")
        .alias("den_q"),
        (nd * F.col("dspp") - F.col("dsp") * F.col("dsp"))
        .cast("double")
        .alias("den_p"),
    )
    corr = F.col("num") / F.sqrt(F.col("den_q") * F.col("den_p"))
    return x.select(
        "l_returnflag", "n", "sq", "sp", "sqq", "spp", "sqp",
        corr.alias("corr_qty_price"),
    )


# --------------------------------------------------------------------------
# C family: correlated subquery shapes
# --------------------------------------------------------------------------


@query(
    "c8_scalar_subquery",
    oracle="""
    WITH nation_avg AS (
      SELECT c_nationkey,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(c_acctbal) AS avg_bal
      FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_nationkey AS nationkey,
           COUNT(*) AS n_above_avg,
           MAX(c.c_acctbal) AS max_bal
    FROM customer c JOIN nation_avg a ON c.c_nationkey = a.c_nationkey
    WHERE c.c_acctbal > a.avg_bal
    GROUP BY c.c_nationkey
    """,
)
def c8_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (balance above the nation average),
    decorrelated into agg + broadcast join — the plan Catalyst produces
    for the subquery form, written explicitly. The per-nation average
    uses exact decimal sums so both engines compare against the
    identical double."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        decimal_sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
        / F.count("c_acctbal")
    ).alias("avg_bal")
    nation_avg = cust.groupBy(F.col("c_nationkey").alias("k")).agg(avg_bal)
    return (
        cust.join(F.broadcast(nation_avg), cust.c_nationkey == nation_avg.k)
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_above_avg"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


@query(
    "c9_not_exists",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000
    )
    GROUP BY c_mktsegment
    """,
)
def c9_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS with a correlated predicate -> left ANTI join against
    the pre-filtered subquery. The filter runs BEFORE the join, so the
    anti side carries only qualifying orders (predicate pushdown keeps
    the 100 TB scan on the pruned column set)."""
    cust = load_table(spark, sf_dir, "customer")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 350000)
        .select("o_custkey")
    )
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


# --------------------------------------------------------------------------
# G family: set operators
# --------------------------------------------------------------------------


@query(
    "g3_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def g3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — customers active in both 1995 and 1996.
    Spark plans a partial-aggregated semi-join shuffle on the key."""
    orders = load_table(spark, sf_dir, "orders")

    def active(year: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp_ntz"))
        ).select(F.col("o_custkey").alias("custkey"))

    return active(1995).intersect(active(1996))


@query(
    "g4_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def g4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — churned customers: active 1995, gone 1996.
    ``subtract`` is SQL EXCEPT's SET semantics; ``exceptAll`` would be
    multiset difference (keys ordered in both years but more often in
    1995 would survive)."""
    orders = load_table(spark, sf_dir, "orders")

    def active(year: int) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp_ntz"))
        ).select(F.col("o_custkey").alias("custkey"))

    return active(1995).subtract(active(1996))


# --------------------------------------------------------------------------
# H family: pattern matching
# --------------------------------------------------------------------------


@query(
    "h20_like_patterns",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(CASE WHEN text LIKE '%data%' THEN 1 END) AS n_contains_data,
           COUNT(CASE WHEN text LIKE 'The%' THEN 1 END) AS n_starts_the,
           COUNT(CASE WHEN text ILIKE '%ERROR%' THEN 1 END) AS n_ilike_error,
           COUNT(CASE WHEN text NOT LIKE '%the%' THEN 1 END) AS n_no_the
    FROM documents GROUP BY lang
    """,
)
def h20_like_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / ILIKE / NOT LIKE conditional counts per language. All four
    predicates evaluate in one scan (conditional aggregation, map-side
    partials) — not four scans."""
    t = F.col("text")
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(t.like("%data%"), 1)).alias("n_contains_data"),
        F.count(F.when(t.like("The%"), 1)).alias("n_starts_the"),
        F.count(F.when(t.ilike("%ERROR%"), 1)).alias("n_ilike_error"),
        F.count(F.when(~t.like("%the%"), 1)).alias("n_no_the"),
    )


@query(
    "h21_regexp_extract",
    oracle="""
    SELECT token, n FROM (
      SELECT regexp_extract(lower(text), '^([a-z]+)', 1) AS token,
             COUNT(*) AS n
      FROM documents
      WHERE regexp_extract(lower(text), '^([a-z]+)', 1) <> ''
      GROUP BY 1
    )
    ORDER BY n DESC, token LIMIT 20
    """,
)
def h21_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract leading-word histogram, top-20 with a total order
    (count desc, token) so LIMIT is deterministic. The simple character
    class behaves identically under Java regex and RE2."""
    token = F.regexp_extract(F.lower(F.col("text")), r"^([a-z]+)", 1)
    return (
        load_table(spark, sf_dir, "documents")
        .select(token.alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


# --------------------------------------------------------------------------
# px family: training-data pipeline — deterministic splits & sampling
# --------------------------------------------------------------------------


@query(
    "px2_hash_split",
    oracle=f"""
    SELECT CASE WHEN h < 8 THEN 'train' WHEN h = 8 THEN 'val' ELSE 'test' END
             AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT n_chars,
             {_md5_mod_sql("CAST(doc_id AS VARCHAR)", 10)} AS h
      FROM documents
    )
    GROUP BY 1
    """,
)
def px2_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split keyed on
    md5(doc_id) — stable across runs, cluster sizes, and engines
    (never ``rand()``: re-sampling on retry would leak val into train).
    Narrow map-side op; no shuffle beyond the final 3-group agg."""
    h = _md5_mod(F.col("doc_id").cast("string"), 10)
    split = (
        F.when(h < 8, F.lit("train")).when(h == 8, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "px3_stratified_sample",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_total,
           COUNT(CASE WHEN {_md5_mod_sql("CAST(doc_id AS VARCHAR)", 100)} < 10
                 THEN 1 END) AS n_sampled,
           CAST(SUM(CASE WHEN {_md5_mod_sql("CAST(doc_id AS VARCHAR)", 100)} < 10
               THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars
    FROM documents GROUP BY lang
    """,
)
def px3_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic 10% sample audit: one scan computes
    total and in-sample counts per language via conditional aggregation.
    The hash-threshold membership rule means any worker can re-derive
    the sample without coordination — no sampled-id broadcast at 100 TB."""
    in_sample = _md5_mod(F.col("doc_id").cast("string"), 100) < 10
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.count(F.when(in_sample, 1)).alias("n_sampled"),
            F.sum(F.when(in_sample, F.col("n_chars")).otherwise(0)).alias(
                "sampled_chars"
            ),
        )
    )


# --------------------------------------------------------------------------
# sim family: range similarity search
# --------------------------------------------------------------------------

SIM5_N_PROBES = 5
SIM5_THRESHOLD = 0.35


@query(
    "sim5_range_search",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding FROM embeddings
      WHERE vec_id < {SIM5_N_PROBES}
    )
    SELECT q.query_id, e.vec_id AS neighbor_id,
           list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[])
               AS similarity
    FROM embeddings e, q
    WHERE e.vec_id <> q.query_id
      AND list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[])
            >= {SIM5_THRESHOLD}
    """,
)
def sim5_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) similarity search: ALL neighbors within a cosine
    threshold of each probe — the dedup/retrieval primitive top-k can't
    express (result cardinality is data-dependent). Exact scan: probes
    broadcast, corpus streams past map-side; the similarity is the same
    bit-exact fold as sim1, so the threshold cut is identical in both
    engines. The LSH-bucketed scale path for large probe sets is sim2's
    band join — this operator is the exact baseline."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "en", arrow_norm(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < SIM5_N_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("en").alias("qn"),
    )
    sim = arrow_dot(F.col("embedding"), F.col("qv")) / (F.col("en") * F.col("qn"))
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            sim.alias("similarity"),
        )
        .filter(F.col("similarity") >= SIM5_THRESHOLD)
    )


# --------------------------------------------------------------------------
# H/D/F second batch: array functions, exact order statistics, pagination
# --------------------------------------------------------------------------


@query(
    "h22_array_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS n_dims,
           list_aggregate(embedding, 'min')::DOUBLE AS emb_min,
           list_aggregate(embedding, 'max')::DOUBLE AS emb_max,
           list_aggregate(embedding[1:8], 'max')::DOUBLE AS head8_max
    FROM embeddings WHERE vec_id < 100
    """,
)
def h22_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array primitives over the embedding column (size / element
    min-max / slice). No arithmetic — raw float elements widen to
    double exactly, so values are bit-identical by construction. Scalars
    only in the output: array-typed result columns are hostile to
    value-hash comparators."""
    e = F.col("embedding")
    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.size(e).alias("n_dims"),
            F.array_min(e).cast("double").alias("emb_min"),
            F.array_max(e).cast("double").alias("emb_max"),
            F.array_max(F.slice(e, 1, 8)).cast("double").alias("head8_max"),
        )
    )


@query(
    "d20_order_statistics",
    oracle="""
    SELECT o_orderpriority,
           median(o_totalprice) AS med_price,
           quantile_disc(o_totalprice, 0.5) AS p50_disc,
           quantile_disc(o_totalprice, 0.9) AS p90_disc,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def d20_order_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order statistics: interpolated median (one (a+b)/2 double
    op — deterministic) and discrete percentiles (pick an actual data
    value — no arithmetic at all). Exact percentiles shuffle the full
    value multiset per group; for 100 TB dashboards prefer the
    d15 approx sketches — this operator is the exact-answer path."""
    p = F.col("o_totalprice")
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.median(p).alias("med_price"),
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p50_disc"),
            F.expr(
                "percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("p90_disc"),
            F.min(p).alias("min_price"),
            F.max(p).alias("max_price"),
        )
    )


@query(
    "d21_bool_aggregates",
    oracle="""
    SELECT lang,
           bool_and(n_chars >= 10) AS all_ge10,
           bool_or(n_chars > 2000) AS any_gt2000,
           CAST(COUNT(CASE WHEN n_chars > 1000 THEN 1 END) AS BIGINT)
             AS n_gt1000
    FROM documents GROUP BY lang
    """,
)
def d21_bool_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOOL_AND / BOOL_OR — order-independent by algebra (AND/OR are
    commutative+associative), safe under any partitioning."""
    n = F.col("n_chars")
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.bool_and(n >= 10).alias("all_ge10"),
            F.bool_or(n > 2000).alias("any_gt2000"),
            F.count(F.when(n > 1000, 1)).alias("n_gt1000"),
        )
    )


@query(
    "f7_pagination",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 20 OFFSET 40
    """,
)
def f7_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination under a TOTAL order (ties broken by key
    — without that, page boundaries are nondeterministic). Spark plans
    offset+limit as a single top-(offset+limit) selection, not a full
    sort."""
    return (
        load_table(spark, sf_dir, "customer")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .offset(40)
        .limit(20)
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "h23_conditional_funcs",
    oracle="""
    SELECT o_orderkey,
           least(greatest(o_totalprice, 50000.0), 400000.0) AS clamped_price,
           nullif(o_orderstatus, 'O') AS status_or_null,
           coalesce(nullif(o_orderpriority, '4-NOT SPECIFIED'), 'UNSPEC')
             AS priority_pref
    FROM orders WHERE o_orderkey < 2000
    """,
)
def h23_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GREATEST/LEAST clamping, NULLIF, COALESCE — pure comparisons and
    selections on raw values, no arithmetic: exact by construction."""
    p = F.col("o_totalprice")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            F.least(F.greatest(p, F.lit(50000.0)), F.lit(400000.0)).alias(
                "clamped_price"
            ),
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
            F.coalesce(
                F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")),
                F.lit("UNSPEC"),
            ).alias("priority_pref"),
        )
    )


@query(
    "d22_multi_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def d22_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate — Spark plans a single
    Expand (one row per distinct-column set) + two-phase aggregate, not
    one scan per distinct. At scale watch the Expand factor (rows x
    number of distinct specs); beyond a few specs, approx_count_distinct
    (d15) is the cheaper answer."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "i13_event_transitions",
    oracle="""
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def i13_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (the Markov-chain
    precursor behind funnel/journey analytics): one window shuffle on
    user_id, then a tiny (types x types) aggregation."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("event_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )


@query(
    "tx8_word_bigrams",
    oracle="""
    WITH w AS (
      SELECT string_split(lower(text), ' ') AS ws FROM documents
    ),
    pairs AS (
      SELECT unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS p
      FROM w WHERE len(ws) >= 2
    )
    SELECT p[1] || ' ' || p[2] AS bigram, COUNT(*) AS n
    FROM pairs
    GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20
    """,
)
def tx8_word_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequencies (tokenizer-training / collocation
    statistics, the 2-gram sibling of tx7's unigram vocab). The
    adjacent-pair construction is pure array algebra — zip of the word
    list against its own shift — exploded once; no UDF, no self-join.
    Top-20 under a total order."""
    words = F.split(F.lower(F.col("text")), " ")
    n = F.size(words)
    pairs = F.arrays_zip(
        F.slice(words, 1, n - 1).alias("a"),
        F.slice(words, 2, n - 1).alias("b"),
    )
    return (
        load_table(spark, sf_dir, "documents")
        .filter(n >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(F.concat(F.col("p.a"), F.lit(" "), F.col("p.b")).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@query(
    "c10_salted_skew_join",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def c10_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events joined to their user dimension through the SALTED join
    path (functions/skew.py): hot user_ids spread across 8 salt buckets
    instead of landing on one task — the deterministic fallback when
    AQE's runtime skew handling isn't enough. Salting is internal: the
    aggregated result is identical to the plain join the oracle runs,
    which is exactly the property that makes the technique safe."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.functions.skew import (
        salted_join,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        salted_join(ev, cust, "user_id", salt=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "h24_string_functions",
    oracle="""
    SELECT doc_id,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           replace(substr(text, 1, 20), ' ', '_') AS head_snake,
           upper(lang) AS lang_uc,
           length(text) AS n_chars_str
    FROM documents WHERE doc_id < 500
    """,
)
def h24_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LPAD / SUBSTR / REPLACE / UPPER / LENGTH — pure string kernels,
    byte-deterministic on the ASCII corpus (length counts characters
    identically in both engines for single-byte text)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 500)
        .select(
            "doc_id",
            F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
            F.replace(
                F.substring(F.col("text"), 1, 20), F.lit(" "), F.lit("_")
            ).alias("head_snake"),
            F.upper(F.col("lang")).alias("lang_uc"),
            F.length(F.col("text")).cast("long").alias("n_chars_str"),
        )
    )


@query(
    "h25_date_parts",
    oracle="""
    SELECT CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           COUNT(*) AS n
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def h25_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUARTER / ISO week / day-of-year extraction (both engines use
    ISO-8601 week numbering)."""
    d = F.col("o_orderdate")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(
            (d >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (d < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .groupBy(
            F.quarter(d).alias("qtr"),
            F.weekofyear(d).alias("iso_week"),
            F.dayofyear(d).alias("doy"),
        )
        .agg(F.count("*").alias("n"))
    )


@query(
    "c11_dense_grid_report",
    oracle="""
    WITH months AS (
      SELECT generate_series AS m
      FROM generate_series(TIMESTAMP '1997-01-01', TIMESTAMP '1997-12-01',
                           INTERVAL 1 MONTH)
    ),
    statuses AS (SELECT DISTINCT o_orderstatus AS st FROM orders),
    actual AS (
      SELECT date_trunc('month', o_orderdate) AS m, o_orderstatus AS st,
             COUNT(*) AS n
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    )
    SELECT CAST(months.m AS DATE) AS month, statuses.st AS status,
           COALESCE(actual.n, 0) AS n_orders
    FROM months CROSS JOIN statuses
    LEFT JOIN actual ON actual.m = months.m AND actual.st = statuses.st
    """,
)
def c11_dense_grid_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-grid report: month spine x status grid LEFT JOIN actual
    counts, zero-filled — the reporting pattern that makes 'no rows'
    visible as 0 instead of a missing row (reference dashboards assume
    every status appears; this makes it structural). The spine and grid
    are tiny generated dims (broadcast); the fact aggregates BEFORE the
    join, so the grid join touches group-cardinality rows only."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    months = spark.sql(
        "SELECT explode(sequence(DATE'1997-01-01', DATE'1997-12-01', "
        "INTERVAL 1 MONTH)) AS month"
    )
    statuses = orders.select(
        F.col("o_orderstatus").alias("status")
    ).distinct()
    actual = (
        orders.filter(
            (d >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (d < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .groupBy(
            F.date_trunc("month", d).cast("date").alias("month"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count("*").alias("n"))
    )
    return (
        months.crossJoin(F.broadcast(statuses))
        .join(F.broadcast(actual), ["month", "status"], "left")
        .select(
            "month",
            "status",
            F.coalesce("n", F.lit(0)).alias("n_orders"),
        )
    )


@query(
    "px4_contamination_check",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, lang, md5(text) AS fingerprint,
             {_md5_mod_sql("CAST(doc_id AS VARCHAR)", 10)} AS h
      FROM documents
    ),
    bench AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 97 = 0),
    train AS (SELECT * FROM fp WHERE h < 8)
    SELECT train.lang,
           COUNT(*) AS n_train_docs,
           COUNT(CASE WHEN bench.fingerprint IS NOT NULL THEN 1 END)
             AS n_contaminated
    FROM train LEFT JOIN bench ON train.fingerprint = bench.fingerprint
    GROUP BY train.lang
    """,
)
def px4_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: how many training-split documents
    are byte-identical to a held-out benchmark document (exact md5
    fingerprint collision). The benchmark fingerprint set is tiny and
    deduplicated -> broadcast left join against the training split; at
    100 TB the train side streams map-side past it. Near-dup
    contamination (not just exact) is the same query over dd4/dd6
    candidate pairs."""
    fp = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.md5(F.col("text")).alias("fingerprint"),
        _md5_mod(F.col("doc_id").cast("string"), 10).alias("h"),
    )
    bench = (
        fp.filter(F.col("doc_id") % 97 == 0)
        .select(F.col("fingerprint").alias("bench_fp"))
        .distinct()
    )
    train = fp.filter(F.col("h") < 8)
    return (
        train.join(
            F.broadcast(bench), train.fingerprint == bench.bench_fp, "left"
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_train_docs"),
            F.count(F.when(F.col("bench_fp").isNotNull(), 1)).alias(
                "n_contaminated"
            ),
        )
    )


@query(
    "g5_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 9900
    """,
)
def g5_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — set union of two key sets; `union()` alone is
    UNION ALL, the distinct() is what gives SQL UNION semantics."""
    big_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    rich = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return big_orders.union(rich).distinct()


@query(
    "d23_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, value
    FROM (SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_tax
          FROM lineitem WHERE l_orderkey < 500)
    UNPIVOT (value FOR measure IN (l_extendedprice, l_discount, l_tax))
    """,
)
def d23_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT wide measure columns into (measure, value) rows — d16's
    inverse. `unpivot` (melt) is a narrow map-side transform: no
    shuffle, output = rows x measures. Raw double values pass through
    untouched — exact by construction."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 500)
        .select(
            "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "value",
        )
    )


@query(
    "e9_distribution_windows",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume
    FROM customer
    WHERE c_custkey < 300
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def e9_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK / CUME_DIST — rank-derived ratios: one integer rank
    divided by one count, a single double op each, deterministic under
    the total order."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 300)
        .select(
            "c_custkey",
            "c_mktsegment",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
    )


@query(
    "h26_bit_operations",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 7 AS or_seven,
           xor(o_orderkey, 170) AS xored,
           o_orderkey << 2 AS shifted
    FROM orders WHERE o_orderkey < 2000
    """,
)
def h26_bit_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR/shift — exact integer kernels (the primitives
    under the engine's own SimHash/MinHash lane packing)."""
    k = F.col("o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(k < 2000)
        .select(
            "o_orderkey",
            k.bitwiseAND(F.lit(255)).alias("low_byte"),
            k.bitwiseOR(F.lit(7)).alias("or_seven"),
            k.bitwiseXOR(F.lit(170)).alias("xored"),
            F.shiftleft(k, 2).alias("shifted"),
        )
    )


@query(
    "d24_value_histogram",
    oracle="""
    SELECT LEAST(CAST(floor(o_totalprice / 50000.0) AS INT), 10) AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders GROUP BY 1
    """,
)
def d24_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram via floor division (the identical
    arithmetic on both sides — width_bucket's semantics without relying
    on either engine's builtin). One scan, one tiny aggregation; the
    histogram shape Spark's own rangepartitioning sampling estimates,
    computed exactly."""
    p = F.col("o_totalprice")
    bucket = F.least(F.floor(p / 50000.0).cast("int"), F.lit(10))
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min(p).alias("lo"),
            F.max(p).alias("hi"),
        )
    )


@query(
    "mm4_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte,
           CASE ascii(substr(text, 1, 1)) % 3
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
           END AS modality,
           substr(md5(text), 1, 8) AS content_id
    FROM documents WHERE doc_id < 500
    """,
)
def mm4_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata extraction: the payload becomes a real
    BinaryType column (``encode``), sized with octet_length; the first
    byte routes to a (deterministic fake) modality — the dispatch
    pattern a real pipeline uses on magic bytes; md5 prefix is the
    content id. All plumbing, no codec — the decode stage itself stays
    behind the multimodal stubs (operators/multimodal.py)."""
    data = F.encode(F.col("text"), "UTF-8")  # BinaryType column
    first = F.ascii(F.substring(F.col("text"), 1, 1))
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 500)
        .select(
            "doc_id",
            F.octet_length(data).cast("long").alias("n_bytes"),
            first.cast("int").alias("first_byte"),
            F.when(first % 3 == 0, "image")
            .when(first % 3 == 1, "audio")
            .otherwise("video")
            .alias("modality"),
            F.substring(F.md5(F.col("text")), 1, 8).alias("content_id"),
        )
    )


KNN_GRAPH_K = 3


def _sim6_oracle() -> str:
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.similarity import (
        banded_sql_cte,
    )

    return f"""
    WITH {banded_sql_cte()},
    cand AS (
      SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id
      FROM banded a
      JOIN banded b ON a.band_id = b.band_id AND a.bucket = b.bucket
                   AND a.vec_id <> b.vec_id
    ),
    s AS (
      SELECT cand.vec_id, cand.neighbor_id,
             list_cosine_similarity(x.embedding::DOUBLE[],
                                    y.embedding::DOUBLE[]) AS similarity
      FROM cand
      JOIN embeddings x ON x.vec_id = cand.vec_id
      JOIN embeddings y ON y.vec_id = cand.neighbor_id
    )
    SELECT vec_id, neighbor_id, similarity, CAST(rnk AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY similarity DESC, neighbor_id) AS rnk
      FROM s
    ) WHERE rnk <= {KNN_GRAPH_K}
    """


@query("sim6_knn_graph", oracle=_sim6_oracle())
def sim6_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full kNN GRAPH: every vector's top-k neighbors among its LSH
    band-collision candidates — the backbone of graph-based dedup
    (connected components over kNN edges), diversity sampling, and
    kNN-graph ANN indexes. Unlike sim1 (a handful of probes against the
    whole corpus), this ranks candidates for EVERY vector, so the
    all-pairs cross join is replaced by the band self-join: cost tracks
    bucket collisions, not n^2. Shares planes with sim2/dd6, so the
    oracle buckets identically. Vectors with no collisions simply have
    no edges — acceptable for graph workloads (singletons).

    NOTE: the 2-bit band geometry here is PINNED for oracle parity and
    goes quadratic as the corpus grows (BASELINE.md records 36x at 10x
    vectors). The production entry point is
    ``operators.ann_auto.knn_graph`` (corpus-adaptive geometry,
    driver-checked as ``sim11_knn_graph_auto``); sim10 is the
    occupancy-constant pinned twin."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.similarity import (
        _band_planes,
        arrow_band_buckets,
        arrow_dot,
        arrow_norm,
    )

    planes = _band_planes()
    emb = load_table(spark, sf_dir, "embeddings")
    banded = emb.select(
        "vec_id",
        F.posexplode(arrow_band_buckets(F.col("embedding"), planes)).alias(
            "band_id", "bucket"
        ),
    )
    a, b = banded.alias("a"), banded.alias("b")
    # each undirected pair is joined, deduped, and dotted ONCE (a < b —
    # halves the candidate volume and the similarity work), then both
    # directed edges are emitted by an explode: cosine is symmetric down
    # to the bit (IEEE multiply commutes), so the mirrored edge carries
    # the identical value the two-sided join used to recompute
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_id"), F.col("b.vec_id").alias("neighbor_id"))
        .distinct()
    )
    x = emb.select(
        F.col("vec_id"),
        F.col("embedding").alias("ex"),
        arrow_norm(F.col("embedding")).alias("nx"),
    )
    y = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ey"),
        arrow_norm(F.col("embedding")).alias("ny"),
    )
    sim = arrow_dot(F.col("ex"), F.col("ey")) / (F.col("nx") * F.col("ny"))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        cand.join(x, "vec_id")
        .join(y, "neighbor_id")
        .select("vec_id", "neighbor_id", sim.alias("similarity"))
        .select(
            F.explode(
                F.array(
                    F.struct("vec_id", "neighbor_id", "similarity"),
                    F.struct(
                        F.col("neighbor_id").alias("vec_id"),
                        F.col("vec_id").alias("neighbor_id"),
                        F.col("similarity"),
                    ),
                )
            ).alias("e")
        )
        .select("e.*")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_GRAPH_K)
    )


SHARD_TOKEN_BUDGET = 4000


@query(
    "px5_shard_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT lang,
             CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) - n_tokens)
                  // {SHARD_TOKEN_BUDGET} AS BIGINT) AS shard_id,
             n_tokens
      FROM toks
    )
    SELECT lang, shard_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
    FROM packed GROUP BY lang, shard_id
    """,
)
def px5_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted shard assignment — the deterministic 'write the
    training shards' step: documents pack greedily into per-language
    shards of ~SHARD_TOKEN_BUDGET tokens via an exclusive running sum (integer
    arithmetic, exact). Deterministic order (doc_id) means a re-run —
    or a different cluster — produces byte-identical shard membership.
    Scale: the running sum partitions by lang (shards are per-stream);
    a global pack would single-thread the window — don't."""
    words = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", words.cast("long").alias("n_tokens")
    )
    # `div` = exact integer division, matching DuckDB's `//` bit-for-bit:
    # a double-divide-then-cast can land in the wrong bucket once the
    # running sum exceeds ~2^41 (doubles stop being exact integers there)
    packed = toks.withColumn("run_sum", F.sum("n_tokens").over(w)).select(
        "lang",
        F.expr(f"(run_sum - n_tokens) div {SHARD_TOKEN_BUDGET}").alias(
            "shard_id"
        ),
        "n_tokens",
    )
    return packed.groupBy("lang", "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
    )


STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")


@query(
    "tx9_stopword_profile",
    oracle=f"""
    SELECT lang,
           CAST(SUM(len(list_filter(string_split(lower(text), ' '),
                   x -> x IN {STOPWORDS!r}))) AS BIGINT) AS n_stopwords,
           CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
               AS n_tokens,
           CAST(SUM(len(list_filter(string_split(lower(text), ' '),
                        x -> x IN {STOPWORDS!r}))) AS DOUBLE)
             / SUM(len(string_split(lower(text), ' '))) AS stopword_ratio
    FROM documents GROUP BY lang
    """.replace('"', "'"),
)
def tx9_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stopword-density profile — the classic quality /
    language-consistency signal (a low English stopword ratio flags
    boilerplate or mislabeled language). Array filter against a literal
    stopword set: integer counts are exact, the ratio is one double
    division. No explode — the filter runs inside the array, so rows
    never multiply."""
    words = F.split(F.lower(F.col("text")), " ")
    in_list = " OR ".join(f"x = '{w}'" for w in STOPWORDS)
    n_stop = F.size(F.expr(f"filter(split(lower(text), ' '), x -> {in_list})"))
    n_tok = F.size(words)
    return (
        load_table(spark, sf_dir, "documents")
        .select("lang", n_stop.alias("s"), n_tok.alias("t"))
        .groupBy("lang")
        .agg(
            F.sum("s").alias("n_stopwords"),
            F.sum("t").alias("n_tokens"),
            (F.sum("s").cast("double") / F.sum("t")).alias("stopword_ratio"),
        )
    )


@query(
    "d25_top_percent",
    oracle="""
    WITH ranked AS (
      SELECT c_custkey, c_acctbal,
             ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn,
             COUNT(*) OVER () AS n_total
      FROM customer
    )
    SELECT c_custkey, c_acctbal, CAST(rn AS INT) AS rn
    FROM ranked
    WHERE rn <= CAST(ceil(n_total * 0.01) AS BIGINT)
    """,
)
def d25_top_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N-PERCENT selection with a data-dependent cutoff
    (ceil(1% of count)) — the SCALE-SAFE shape: pass 1 is an exact
    COUNT (one map-side-combinable scan), whose result lands in the
    plan as a LITERAL limit; pass 2 is orderBy().limit(k), which
    Catalyst plans as TakeOrderedAndProject — every partition keeps a
    k-row heap and only k rows reach the driver-side merge, never a
    single-partition global sort/window. The rank is recomputed over
    the k selected rows only (k ~ 1% of n; at 100 TB pair this with a
    LIMIT pushed into the scan — the heap never materializes the
    table). ceil and the compare are integer-exact, so both passes see
    the identical cutoff the one-pass window oracle computes."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    n_total = cust.count()  # pass 1: exact count -> literal cutoff
    k = int(math.ceil(n_total * 0.01))
    top = cust.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey")).limit(k)
    w_rank = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return top.select(
        "c_custkey", "c_acctbal", F.row_number().over(w_rank).alias("rn")
    )


@query(
    "h27_month_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(last_day(o_orderdate) AS DATE) AS month_end,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3_months,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
    FROM orders WHERE o_orderkey < 2000
    """,
)
def h27_month_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST_DAY / ADD_MONTHS / month truncation — calendar arithmetic
    with identical end-of-month clamping rules in both engines."""
    d = F.col("o_orderdate")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            F.last_day(d).alias("month_end"),
            F.add_months(d, 3).cast("timestamp_ntz").alias("plus_3_months"),
            F.date_trunc("month", d).cast("date").alias("month_start"),
        )
    )


@query(
    "d26_grouping_sets",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           CAST(GROUPING(r_name) AS BIGINT) AS is_region_total,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS is_priority_total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name), (o_orderpriority))
    """,
)
def d26_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind d17 ROLLUP /
    d18 CUBE): the (region, priority) detail plus BOTH one-dimensional
    margins in ONE pass — Spark expands the sets over a single shuffled
    aggregate, not one scan per set. GROUPING() flags disambiguate a
    genuine 'ALL' value from the margin rows, same contract as the
    warehouse. Dims broadcast; the fact side is scanned once."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            nation["n_regionkey"] == region["r_regionkey"],
        )
    )
    agg = joined.groupingSets(
        [["r_name", "o_orderpriority"], ["r_name"], ["o_orderpriority"]],
        "r_name",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n_orders"),
        F.grouping("r_name").cast("long").alias("is_region_total"),
        F.grouping("o_orderpriority").cast("long").alias("is_priority_total"),
    )
    return agg.select(
        F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
        F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
        "n_orders",
        "is_region_total",
        "is_priority_total",
    )


@query(
    "h28_array_agg_semistructured",
    oracle="""
    WITH per_nation AS (
      SELECT n_name,
             list_sort(list(DISTINCT c_mktsegment)) AS segments
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name,
           CAST(len(segments) AS INT) AS n_segments,
           segments[1] AS first_segment,
           CAST(list_contains(segments, 'BUILDING') AS BOOLEAN)
               AS has_building,
           array_to_string(segments, '|') AS segments_joined
    FROM per_nation
    """,
)
def h28_array_agg_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/semi-structured family (Snowflake ARRAY_AGG / ARRAY_SIZE /
    ARRAY_CONTAINS / ARRAY_TO_STRING): per-nation sorted distinct
    segment arrays, then element access, membership, and join-to-string
    — all JVM-side built-ins. Determinism: collect_set is
    order-unstable by contract, so the array is SORTED before any
    positional access; every derived value is then order-independent
    across partitionings."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    segs = (
        customer.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("n_name")
        .agg(F.array_sort(F.collect_set("c_mktsegment")).alias("segments"))
    )
    return segs.select(
        "n_name",
        F.size("segments").alias("n_segments"),
        F.element_at("segments", 1).alias("first_segment"),
        F.array_contains("segments", "BUILDING").alias("has_building"),
        F.array_join("segments", "|").alias("segments_joined"),
    )


@query(
    "c12_full_outer_join",
    oracle="""
    WITH y95 AS (
      SELECT o_custkey AS k, COUNT(*) AS n95 FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1996-01-01'
      GROUP BY o_custkey
    ),
    y96 AS (
      SELECT o_custkey AS k, COUNT(*) AS n96 FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY o_custkey
    )
    SELECT COALESCE(y95.k, y96.k) AS custkey,
           COALESCE(n95, 0) AS n_1995,
           COALESCE(n96, 0) AS n_1996,
           (y95.k IS NULL) AS only_1996,
           (y96.k IS NULL) AS only_1995
    FROM y95 FULL OUTER JOIN y96 ON y95.k = y96.k
    """,
)
def c12_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN between two grouped year slices: customers active
    in 1995, 1996, or both, with unmatched sides surfaced as zero counts
    and direction flags. Both inputs shuffle once on the same key, so
    the full-outer SortMergeJoin reuses the aggregation partitioning —
    no extra exchange (and full-outer can never broadcast)."""
    orders = load_table(spark, sf_dir, "orders")

    def year_counts(y: int, alias: str) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp_ntz"))
            )
            .groupBy(F.col("o_custkey").alias("k"))
            .agg(F.count("*").alias(alias))
        )

    a, b = year_counts(1995, "n95"), year_counts(1996, "n96")
    return (
        a.join(b, a["k"] == b["k"], "full_outer")
        .select(
            F.coalesce(a["k"], b["k"]).alias("custkey"),
            F.coalesce(a["n95"], F.lit(0)).alias("n_1995"),
            F.coalesce(b["n96"], F.lit(0)).alias("n_1996"),
            a["k"].isNull().alias("only_1996"),
            b["k"].isNull().alias("only_1995"),
        )
    )


@query(
    "e10_range_interval_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 90 DAY PRECEDING
                            AND CURRENT ROW)
                AS DOUBLE) AS trailing90d_spend
    FROM orders WHERE o_custkey < 200
    """,
)
def e10_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-interval window frame: trailing-90-day spend per customer.
    Unlike a ROWS frame, frame membership depends only on the ORDER
    VALUE (peers included), so the result is deterministic even under
    order-date ties — no tiebreaker column needed. Spark expresses the
    interval bound as an epoch-seconds rangeBetween (NTZ -> timestamp
    under the loader-pinned UTC session -> long, so the epoch is
    process-TZ-independent), matching the oracle's INTERVAL 90 DAY
    bound exactly (both ends inclusive). The decimal accumulation keeps
    sums order-independent inside each frame."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-90 * 86400, 0)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("trailing90d_spend"),
        )
    )


@query(
    "h29_time_arithmetic",
    oracle="""
    WITH t AS (
      SELECT event_id, strftime(ts, '%H:%M:%S') AS time_str
      FROM events WHERE event_id < 2000
    ), s AS (
      SELECT event_id, time_str,
             CAST(split_part(time_str, ':', 1) AS BIGINT) * 3600
           + CAST(split_part(time_str, ':', 2) AS BIGINT) * 60
           + CAST(split_part(time_str, ':', 3) AS BIGINT) AS secs
      FROM t
    )
    SELECT event_id, time_str, secs AS secs_since_midnight,
           printf('%02d:%02d:%02d',
                  ((secs + 5400) % 86400) // 3600,
                  (((secs + 5400) % 86400) % 3600) // 60,
                  ((secs + 5400) % 86400) % 60) AS shifted_90m,
           secs // 60 AS minute_of_day,
           time_str >= '08:30:00' AND time_str < '17:00:00'
             AS in_business_hours
    FROM s
    """,
)
def h29_time_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-of-day arithmetic over the engine's string TIME
    representation (reference stores TIME(9) —
    sql/0.init_healthcare.sql:76, semantic-models yaml:168; Spark has no
    TIME type, so 'HH:mm:ss' strings + the time_to_seconds /
    seconds_to_time shims supply the arithmetic): seconds-since-midnight
    accessor, a +90-minute shift that wraps midnight, minute-of-day
    bucketing, and a lexical business-hours range predicate (string
    order == time order for fixed-width HH:mm:ss). All integer-exact —
    no floats touch the values."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    base = ev.select(
        "event_id", F.date_format(F.col("ts"), "HH:mm:ss").alias("time_str")
    )
    secs = time_to_seconds(F.col("time_str"))
    return base.select(
        "event_id",
        "time_str",
        secs.alias("secs_since_midnight"),
        seconds_to_time((secs + F.lit(5400)) % 86400).alias("shifted_90m"),
        F.floor(secs / 60).cast("long").alias("minute_of_day"),
        (
            (F.col("time_str") >= "08:30:00") & (F.col("time_str") < "17:00:00")
        ).alias("in_business_hours"),
    )


LANG_CAP_DOCS = 150


@query(
    "px7_language_balanced_cap",
    oracle=f"""
    SELECT doc_id, lang, CAST(rnk AS BIGINT) AS sample_rank
    FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      FROM documents
    ) WHERE rnk <= {LANG_CAP_DOCS}
    """,
)
def px7_language_balanced_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LANGUAGE-BALANCED downsampling for training mixes: cap every
    language at {LANG_CAP_DOCS} docs by keeping each language's
    lowest-md5 documents — the deterministic equivalent of per-language
    uniform random downsampling (md5 of the doc id is a seeded uniform
    draw), the standard recipe for reining in over-represented
    languages before pretraining. Integer/string-exact end to end: no
    float thresholds, identical decisions in any engine. Scale: one
    shuffle on lang; the rank-filter window compiles to per-partition
    {LANG_CAP_DOCS}-row heaps (WindowGroupLimit), so a billion-doc
    language never materializes a full sort."""
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.row_number().over(w).cast("long").alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= LANG_CAP_DOCS)
    )


@query(
    "h30_edit_distance",
    oracle="""
    WITH t AS (SELECT DISTINCT event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(levenshtein(a.event_type, b.event_type) AS BIGINT)
               AS edit_distance,
           1.0 - CAST(levenshtein(a.event_type, b.event_type) AS DOUBLE)
               / greatest(length(a.event_type), length(b.event_type))
               AS similarity
    FROM t a JOIN t b ON a.event_type < b.event_type
    """,
)
def h30_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching via LEVENSHTEIN edit distance — the
    entity-resolution primitive (typo-tolerant joins, near-key matching)
    both engines implement with the identical integer DP. Computed over
    the DISTINCT value domain first (a handful of rows), never the raw
    table: at 100 TB you dedupe the join keys, broadcast the tiny
    distinct-pair matrix, and map rows through it — the pattern this
    operator demonstrates. Similarity = 1 - dist/max(len), one double
    division of exact ints."""
    t = (
        load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
    )
    a, b = t.alias("a"), t.alias("b")
    dist = F.levenshtein(F.col("a.event_type"), F.col("b.event_type"))
    max_len = F.greatest(
        F.length(F.col("a.event_type")), F.length(F.col("b.event_type"))
    )
    return a.join(
        F.broadcast(b), F.col("a.event_type") < F.col("b.event_type")
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        dist.cast("long").alias("edit_distance"),
        (F.lit(1.0) - dist.cast("double") / max_len).alias("similarity"),
    )


@query(
    "px10_source_mixture_weights",
    oracle="""
    WITH s AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, total_chars,
           total_chars * 1000000
               // CAST(SUM(total_chars) OVER () AS BIGINT) AS share_ppm,
           CAST(SUM(total_chars) OVER () AS BIGINT) * 1000000
               // (COUNT(*) OVER () * total_chars) AS weight_ppm
    FROM s
    """,
)
def px10_source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix rebalancing weights per corpus source: each source's
    actual share of the corpus (in chars) and the sampling multiplier
    that would take the mix to a UNIFORM target share — the domain-
    mixture knob of a pretraining pipeline (weight > 1e6 ppm means
    upsample, < 1e6 ppm means downsample).

    Determinism at scale: shares and weights are INTEGER ppm via
    floor division of exact counts (all positive, so Spark's truncating
    DIV == DuckDB's flooring //) — no double division whose rounding
    could drift between engines or partitionings. The no-key window
    runs AFTER aggregation has reduced the corpus to source-cardinality
    rows (module-header convention)."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    w = Window.partitionBy()
    return (
        s.withColumn("_corpus", F.sum("total_chars").over(w))
        .withColumn("_k", F.count("*").over(w))
        .select(
            "source",
            "n_docs",
            "total_chars",
            F.expr("total_chars * 1000000 DIV _corpus").alias("share_ppm"),
            F.expr("_corpus * 1000000 DIV (_k * total_chars)").alias(
                "weight_ppm"
            ),
        )
    )


def _years_custkeys(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp_ntz"))
    ).select(F.col("o_custkey").alias("custkey"))


@query(
    "g6_except_all",
    oracle="""
    SELECT custkey, COUNT(*) AS n_excess FROM (
      SELECT o_custkey AS custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1996-01-01'
      EXCEPT ALL
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
    ) GROUP BY custkey
    """,
)
def g6_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — MULTISET difference (g4's bag twin): per customer,
    how many MORE 1995 orders than 1996 orders (max(0, n95-n96) copies
    survive). ``exceptAll`` compiles to a single shuffle on the key with
    per-side counts subtracted — no row-by-row matching; the follow-up
    count collapses the surviving copies, so the pair of aggregations
    pipelines into the same exchange under AQE."""
    a = _years_custkeys(spark, sf_dir, 1995)
    b = _years_custkeys(spark, sf_dir, 1996)
    return a.exceptAll(b).groupBy("custkey").agg(
        F.count("*").alias("n_excess")
    )


@query(
    "g7_intersect_all",
    oracle="""
    SELECT custkey, COUNT(*) AS n_common FROM (
      SELECT o_custkey AS custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1996-01-01'
      INTERSECT ALL
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
    ) GROUP BY custkey
    """,
)
def g7_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (g3's bag twin): per
    customer, min(n95, n96) copies survive; grouped to a deterministic
    per-key count. Same single-shuffle count-based plan as g6."""
    a = _years_custkeys(spark, sf_dir, 1995)
    b = _years_custkeys(spark, sf_dir, 1996)
    return a.intersectAll(b).groupBy("custkey").agg(
        F.count("*").alias("n_common")
    )


@query(
    "f8_keyset_pagination",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    WHERE (o_orderdate, o_orderkey) > (TIMESTAMP '1996-01-01', 3200)
    ORDER BY o_orderdate, o_orderkey
    LIMIT 20
    """,
)
def f8_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYSET (cursor) pagination — the page shape that actually scales:
    ``WHERE (order cols) > (last seen)`` + top-N, so every page is a
    filtered TakeOrderedAndProject regardless of page NUMBER, where
    f7's OFFSET must select offset+limit rows and deep pages degrade
    linearly. The tuple comparison compiles to a struct comparison in
    Spark (lexicographic, same as the SQL row-value constructor), and
    the cursor predicate pushes into the scan as a coarse
    ``o_orderdate >= cursor_date`` range (PushedFilters) with the exact
    struct compare as the residual."""
    orders = load_table(spark, sf_dir, "orders")
    cursor_date = F.lit("1996-01-01").cast("timestamp_ntz")
    after_cursor = F.struct(
        F.col("o_orderdate"), F.col("o_orderkey")
    ) > F.struct(cursor_date, F.lit(3200).cast("long"))
    # coarse range clause FIRST: struct comparisons don't push down, the
    # plain date bound does — the standard keyset-index trick spelled
    # for a columnar scan
    return (
        orders.filter(F.col("o_orderdate") >= cursor_date)
        .filter(after_cursor)
        .orderBy("o_orderdate", "o_orderkey")
        .limit(20)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


def _sim10_oracle() -> str:
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.similarity import (
        scaled_banded_sql_cte,
    )

    return f"""
    WITH {scaled_banded_sql_cte()},
    cand AS (
      SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id
      FROM banded a
      JOIN banded b ON a.band_id = b.band_id AND a.bucket = b.bucket
                   AND a.vec_id <> b.vec_id
    ),
    s AS (
      SELECT cand.vec_id, cand.neighbor_id,
             list_cosine_similarity(x.embedding::DOUBLE[],
                                    y.embedding::DOUBLE[]) AS similarity
      FROM cand
      JOIN embeddings x ON x.vec_id = cand.vec_id
      JOIN embeddings y ON y.vec_id = cand.neighbor_id
    )
    SELECT vec_id, neighbor_id, similarity, CAST(rnk AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY similarity DESC, neighbor_id) AS rnk
      FROM s
    ) WHERE rnk <= {KNN_GRAPH_K}
    """


@query("sim10_knn_graph_scaled", oracle=_sim10_oracle())
def sim10_knn_graph_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim6's kNN graph under the CORPUS-SCALED band geometry: 4 bands x
    6 bits = 64 buckets per band, holding bucket occupancy (and the
    quadratic candidate join) at a 10x corpus to what sim6's 2-bit
    bands see at sf0.1 — the raise-BAND_BITS knob realized as a
    first-class oracle-checked operator rather than a docstring remark
    (BASELINE.md §similarity records the 2-bit config's 36x ratio this
    exists to fix; tools/scale_check.py measures this variant at both
    scales). Recall trades down per band (p^6 vs p^2), which is why the
    bit count is a function of corpus size, not a universal constant.
    Same plan shape as sim6: one pair joined/dotted per undirected
    candidate, both edges mirrored."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.similarity import (
        SCALED_BAND_BITS,
        SCALED_N_BANDS,
        arrow_band_buckets_param,
        arrow_dot,
        arrow_norm,
        scaled_planes,
    )

    planes = scaled_planes()
    emb = load_table(spark, sf_dir, "embeddings")
    banded = emb.select(
        "vec_id",
        F.posexplode(
            arrow_band_buckets_param(
                F.col("embedding"), planes, SCALED_N_BANDS, SCALED_BAND_BITS
            )
        ).alias("band_id", "bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
        )
        .distinct()
    )
    x = emb.select(
        F.col("vec_id"),
        F.col("embedding").alias("ex"),
        arrow_norm(F.col("embedding")).alias("nx"),
    )
    y = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ey"),
        arrow_norm(F.col("embedding")).alias("ny"),
    )
    sim = arrow_dot(F.col("ex"), F.col("ey")) / (F.col("nx") * F.col("ny"))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        cand.join(x, "vec_id")
        .join(y, "neighbor_id")
        .select("vec_id", "neighbor_id", sim.alias("similarity"))
        .select(
            F.explode(
                F.array(
                    F.struct("vec_id", "neighbor_id", "similarity"),
                    F.struct(
                        F.col("neighbor_id").alias("vec_id"),
                        F.col("vec_id").alias("neighbor_id"),
                        F.col("similarity"),
                    ),
                )
            ).alias("e")
        )
        .select("e.*")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_GRAPH_K)
    )
