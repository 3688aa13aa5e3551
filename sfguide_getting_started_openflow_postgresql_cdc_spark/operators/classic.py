"""Classic decision-support join+agg shapes (TPC-H Q7/Q8/Q14/Q17/Q18/Q22
analogs over the testdata star schema) — SURVEY.md §2.C/D extensions.

The reference's analytics layer is join+group+measure SQL over the
CDC-replicated tables (sql/4.analytics_queries.sql — revenue rollups,
top-N, %-of-total); these rows exercise the same engine surface at the
query complexity a reference user's BI tool actually emits: correlated
aggregates decorrelated into self-joins (Q17), HAVING over a fact
pre-aggregation joined back to dims (Q18), multi-hop dim chains with
two role-playing nation joins (Q7), conditional market-share ratios
(Q8), a driver-collected global scalar feeding an anti-join (Q22), and
a dim-attribute conditional share (Q14).

Scale notes (100 TB): every fact-side aggregation is keyed on the fact
table's own join column, so the shuffle is one hash exchange of the
pre-aggregated (not raw) rows; dim joins broadcast below AQE's
threshold and degrade to shuffle joins above it without a plan rewrite.
No query here collects data-proportional rows to the driver — c16's
scalar is ONE value (the bounded-reduction pattern the plan gate
allows).

Determinism (oracle-parity playbook): every double measure is summed as
DECIMAL and cast to DOUBLE once at the end; money products are computed
decimal x decimal (exact) before summation; ratios divide two exact
decimal sums as one double division; DuckDB integer SUM/COUNT_IF
columns are CAST to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.functions.shims import (
    decimal_avg,
    decimal_sum,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import query
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import load_table


def _disc_price() -> F.Column:
    """l_extendedprice * (1 - l_discount) as an EXACT decimal product —
    the d3 convention: money columns are 2-decimal by contract, so the
    casts are value-preserving and the product never rounds."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount")
    ).cast("decimal(4,2)")


def _dp_sql(alias: str = "l") -> str:
    """The oracle-side twin of :func:`_disc_price`."""
    return (
        f"CAST({alias}.l_extendedprice AS DECIMAL(18,2))"
        f" * CAST(1 - {alias}.l_discount AS DECIMAL(4,2))"
    )


@query(
    "c12_small_qty_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE)
               / COUNT(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT COUNT(*) AS n_small,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
             AS small_qty_revenue
    FROM lineitem l JOIN part_avg pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < CAST(0.5 AS DOUBLE) * pa.avg_qty
    """,
)
def c12_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — revenue locked in small-quantity line items:
    the correlated per-part average decorrelated into a lineitem
    self-aggregation joined back on l_partkey. At 100 TB the per-part
    aggregate is the ONLY extra shuffle (pre-aggregated rows, one per
    part); the fact side shuffles once on l_partkey and AQE handles the
    join strategy — never a broadcast of a fact-derived table. The
    average is an exact decimal sum / count double (c8 convention) so
    both engines filter against the identical double."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        decimal_avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(part_avg, li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.count("*").alias("n_small"),
            decimal_sum("l_extendedprice").cast("double").alias("small_qty_revenue"),
        )
    )


@query(
    "c13_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,4))) > 300
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    """,
)
def c13_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — large-volume orders: HAVING over the fact
    pre-aggregation, then joined back to orders/customer for the
    report attributes. The HAVING filter runs on the aggregated rows
    (one per order) BEFORE any join, so the join input collapses from
    the full fact table to the handful of qualifying orders — the
    aggregate-below-join rule (c3/c4) applied to a semi-join-like
    report. Quantity sums are exact decimals; the filter compares
    decimal > 300 exactly, then casts to double once for output."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(decimal_sum("l_quantity").alias("q_dec"))
        .filter(F.col("q_dec") > 300)
        .select("l_orderkey", F.col("q_dec").cast("double").alias("sum_qty"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


@query(
    "c14_nation_trade_flows",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           COUNT(*) AS n_items,
           CAST(SUM({_dp_sql()}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def c14_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — bilateral trade volume between two nations by
    ship year: the nation dim joined TWICE in different roles (supplier
    side and customer side). Both nation filters are applied to the
    25-row dim BEFORE broadcasting, so the supplier and customer sides
    are each pre-pruned to the two qualifying nations and the fact
    table's rows drop at the earliest join. The only all-fact shuffle
    is lineitem⋈orders on the order key; revenue is the exact decimal
    disc-price sum (d3 convention)."""
    nations = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(
            F.col("n_name").isin("NATION_1", "NATION_2")
        )
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(nations, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_disc_price()).cast("double").alias("revenue"),
        )
    )


@query(
    "c15_market_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                         THEN {_dp_sql()}
                         ELSE 0 END) AS DOUBLE)
             / CAST(SUM({_dp_sql()}) AS DOUBLE)
             AS mkt_share,
           CAST(SUM({_dp_sql()}) AS DOUBLE)
             AS regional_revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """,
)
def c15_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — one supplier nation's share of a region's
    revenue per order year: conditional decimal sum over the full
    decimal sum, divided ONCE as doubles (both operands exact, so the
    ratio is the identical IEEE division in both engines — never a sum
    of doubles). The customer->nation->region chain prunes to the ASIA
    region before the fact join; the supplier nation arrives as a
    broadcast dim attribute used only inside the conditional."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_region = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select(F.col("n_nationkey").alias("ck"))
            ),
            F.col("c_nationkey") == F.col("ck"),
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    dp = _disc_price()
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", dp).otherwise(
            F.lit(0).cast("decimal(23,4)")
        )
    ).cast("double")
    den = F.sum(dp).cast("double")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_region, orders.o_custkey == cust_region.c_custkey, "left_semi")
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (num / den).alias("mkt_share"),
            F.sum(dp).cast("double").alias("regional_revenue"),
        )
    )


@query(
    "c16_dormant_high_balance",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY 1
    """,
)
def c16_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — high-balance customers with no recent orders:
    a GLOBAL scalar (average positive balance) gates the scan, and the
    recency predicate is a pre-filtered anti join (c9 convention). The
    scalar is collected to the driver as ONE value — the bounded-
    reduction pattern (plan-gate-reviewed) — because Spark's scalar-
    subquery alternative is a single-row broadcast nested loop the plan
    gate forbids. The average is an exact decimal sum / count double,
    so the collected double is bit-identical to the oracle's."""
    cust = load_table(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_acctbal") > 0)
    avg_row = pos.agg(
        (decimal_sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
         / F.count("*")).alias("a")
    ).first()
    threshold = avg_row["a"]
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    return (
        cust.filter(F.col("c_acctbal") > F.lit(threshold))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            decimal_sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
    )


@query(
    "c17_promo_revenue_share",
    oracle=f"""
    SELECT CAST(month(l.l_shipdate) AS INT) AS ship_month,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN {_dp_sql()}
                         ELSE 0 END) AS DOUBLE) AS promo_revenue,
           CAST(SUM({_dp_sql()}) AS DOUBLE)
             AS total_revenue,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN {_dp_sql()}
                         ELSE 0 END) AS DOUBLE)
             / CAST(SUM({_dp_sql()}) AS DOUBLE)
             * 100.0 AS promo_share_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def c17_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promo parts' share of monthly revenue: a dim
    attribute (p_type) drives a conditional share. The part dim is
    broadcast (pruned to the two needed columns by Catalyst); the share
    divides two exact decimal sums as doubles then scales by 100 — the
    pct_of idiom with a deterministic numerator/denominator."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    dp = _disc_price()
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", dp).otherwise(
            F.lit(0).cast("decimal(23,4)")
        )
    ).cast("double")
    total = F.sum(dp).cast("double")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            promo.alias("promo_revenue"),
            total.alias("total_revenue"),
            (promo / total * F.lit(100.0)).alias("promo_share_pct"),
        )
    )


@query(
    "c18_important_parts",
    oracle="""
    WITH tot AS (
      SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(4,2))) AS t,
             COUNT(DISTINCT l_partkey) AS np
      FROM lineitem
    ),
    per_part AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(4,2))) AS rev
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.l_partkey,
           CAST(p.rev AS DOUBLE) AS part_revenue,
           CAST(p.rev AS DOUBLE) / CAST(tot.t AS DOUBLE) AS revenue_share
    FROM per_part p, tot
    WHERE CAST(p.rev * 10000 AS HUGEINT) * (tot.np * 4)
          > CAST(tot.t * 10000 AS HUGEINT) * 5
    """,
)
def c18_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — groups whose aggregate exceeds a MULTIPLE of
    the average group share (the 'important stock' report, adapted to
    the star schema's lineitem revenue since the testdata has no
    partsupp). The threshold is rev > 1.25x the average per-part
    revenue, anchored to the synthetic corpus's near-uniform revenue
    distribution so every scale yields a non-trivial PROPER subset
    (~12% of parts at sf0.001/0.01/0.1 — the r8 verdict found the old
    fixed 0.1%-of-total threshold selected NOTHING at the driver's sf,
    making the driver green vacuous). The global total and part count
    are driver-collected scalars (two exact values — the c16
    bounded-reduction pattern; the alternative scalar subquery is a
    single-row broadcast nested loop the plan gate forbids). The
    comparison multiplies through instead of dividing — integers on
    both engines (HUGEINT in DuckDB, decimal(38,0) in Spark), scaled
    by 10^4 because the discounted-price product has FOUR decimal
    places (decimal(18,2) x decimal(4,2)); scaling by 100 would make
    Spark's int() TRUNCATE where DuckDB's HUGEINT cast rounds, shifting
    the threshold by up to 5 scaled units — the rounding-tie class the
    project conventions forbid. So borderline parts cannot flip. One
    fact shuffle: the per-part pre-aggregation."""
    import decimal

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.sum(_disc_price()).alias("t"),
        F.countDistinct("l_partkey").alias("np"),
    ).first()
    total, np = row["t"], row["np"]
    # rev * 10000 is integral (scale-4 decimal), so the decimal(38,0)
    # cast and the int() below are EXACT; rev*np*4 > t*5 <=> rev >
    # (t/np)*1.25
    assert int(total * 10000) == total * 10000
    thr = decimal.Decimal(int(total * 10000) * 5)
    per_part = li.groupBy("l_partkey").agg(F.sum(_disc_price()).alias("rev"))
    rev_scaled = (F.col("rev") * F.lit(10000)).cast("decimal(38,0)")
    return per_part.filter(
        rev_scaled * F.lit(int(np) * 4) > F.lit(thr)
    ).select(
        "l_partkey",
        F.col("rev").cast("double").alias("part_revenue"),
        (F.col("rev").cast("double") / F.lit(float(total))).alias(
            "revenue_share"
        ),
    )


@query(
    "c19_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(4,2))) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-07-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total AS DOUBLE) AS total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total = (SELECT MAX(total) FROM rev)
    """,
)
def c19_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — the supplier(s) whose windowed revenue equals
    the GLOBAL maximum (ties kept, per the spec's view formulation).
    The per-supplier pre-aggregation is persisted and reused for both
    the max probe and the filter — one fact scan, one shuffle; the max
    is a driver-collected scalar compared in EXACT decimal, so a
    tie at the top survives on both engines bit-for-bit. Supplier dim
    joins broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_disc_price()).alias("total"))
    rev = rev.persist()
    best = rev.agg(F.max("total").alias("m")).first()["m"]
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    out = (
        rev.filter(F.col("total") == F.lit(best))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total").cast("double").alias("total_revenue")
        )
    )
    return out


@query(
    "c20_bracketed_revenue",
    oracle="""
    SELECT COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def c20_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — revenue under DISJUNCTIVE bracket predicates
    (brand x size-range x quantity-range, OR-ed). The part side of
    every bracket is pushed below the broadcast join (Catalyst derives
    `p_brand IN (...)` + size bounds from the OR and prunes the dim
    before the build side ships); the residual mixed predicate stays in
    the join filter. One broadcast join, zero fact shuffles before the
    final scalar aggregate."""
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem")
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 15))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 50)
           & F.col("l_quantity").between(20, 50))
    )
    return (
        li.join(part, li.l_partkey == F.col("p_partkey"))
        .filter(bracket)
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_disc_price()).cast("double").alias("revenue"),
        )
    )


@query(
    "c21_supplier_diversity",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    ok_supp AS (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT pr.l_suppkey) AS supplier_cnt
    FROM pairs pr
    JOIN ok_supp s ON s.s_suppkey = pr.l_suppkey
    JOIN part p    ON p.p_partkey = pr.l_partkey
    WHERE p.p_brand <> 'Brand#45' AND p.p_type NOT LIKE 'PROMO%'
    GROUP BY 1, 2, 3
    """,
)
def c21_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — how many DISTINCT suppliers can provide each
    part group, excluding flagged suppliers (the NOT IN subquery,
    expressed as a pre-filtered semi join — c9 convention) and excluded
    part families (negated predicates pushed to the broadcast dim).
    The supplier-part relation comes from lineitem (the testdata has no
    partsupp): deduped FIRST so the distinct-count shuffle moves one
    row per (part, supplier), never raw fact rows."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    ok_supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") >= 0)
        .select("s_suppkey")
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & ~F.col("p_type").like("PROMO%")
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        pairs.join(ok_supp, pairs.l_suppkey == F.col("s_suppkey"), "left_semi")
        .join(part, pairs.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "c22_sole_late_supplier",
    oracle="""
    WITH pair AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY 1, 2
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(*) AS n_supp,
             SUM(late) AS n_late,
             MAX(CASE WHEN late = 1 THEN l_suppkey END) AS lone_late
      FROM pair GROUP BY 1
    ),
    waits AS (
      SELECT lone_late AS suppkey, COUNT(*) AS numwait
      FROM per_order WHERE n_supp >= 2 AND n_late = 1
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, CAST(w.numwait AS BIGINT) AS numwait
    FROM waits w JOIN supplier s ON s.s_suppkey = w.suppkey
    """,
)
def c22_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — 'suppliers who kept orders waiting': for each
    finished multi-supplier order, the supplier who was the ONLY late
    one (EXISTS another supplier on the order / NOT EXISTS another LATE
    supplier — the spec's double-correlated-subquery pair). Late is
    adapted to the star schema's columns: shipped more than 90 days
    after the order date (the testdata has no receipt/commit dates).

    Decorrelation (Spark-first): both EXISTS collapse into ONE
    per-order aggregate over deduped (order, supplier, late) rows —
    `n_supp >= 2 AND n_late = 1`, with the culprit recovered as
    `MAX(CASE WHEN late...)`, exact because the filter pins exactly one
    late supplier per qualifying order. Scale shape: the fact->orders
    join, the pair dedup, and the per-order aggregate ALL hash on
    l_orderkey, so Catalyst reuses one exchange for the three steps;
    the final per-supplier count shuffles pre-aggregated rows and the
    supplier dim broadcasts. Timestamps compare exactly (TIMESTAMP_NTZ
    + whole-day interval) on both engines."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    pair = (
        li.join(orders, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    per_order = pair.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
            "lone_late"
        ),
    )
    waits = (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .groupBy("lone_late")
        .agg(F.count("*").alias("numwait"))
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return waits.join(supp, waits.lone_late == F.col("s_suppkey")).select(
        "s_suppkey", "s_name", F.col("numwait").cast("long").alias("numwait")
    )


@query(
    "c23_order_priority_check",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def c23_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — order-priority checking: how many orders in a
    quarter had at least one line item shipped late (the correlated
    EXISTS; 'late' adapted to the star schema as shipped more than 60
    days after the order date, the c22 convention). Expressed as a
    LEFT SEMI join with the correlated predicate IN the join condition,
    so Spark never materializes the per-order match list — one hash
    exchange of each side on the order key and the date filter prunes
    the orders side before the shuffle. The 5-group count aggregate is
    map-side partial."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate
            > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("order_count")
    )


@query(
    "c24_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(SUM({_dp_sql('l')}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def c24_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — revenue that stayed 'local': line items whose
    supplier and ordering customer sit in the SAME nation of one
    region, by nation. The region->nation chain collapses into one
    pre-filtered 25-row broadcast; supplier rides with its nation name
    as a broadcast dim. The two fact-sized exchanges are
    lineitem⋈orders (order key) and ⋈customer (cust key) — the same
    join tree AQE would pick at 100 TB, with the same-nation equality
    applied as a residual filter at the earliest join where both
    nation keys exist. Revenue is the exact decimal disc-price sum."""
    nations = F.broadcast(
        load_table(spark, sf_dir, "nation")
        .join(
            load_table(spark, sf_dir, "region").filter(
                F.col("r_name") == "ASIA"
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (F.col("s_nationkey") == cust.c_nationkey),
        )
        .groupBy("nation")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@query(
    "c25_returned_top_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name AS nation,
           CAST(SUM({_dp_sql('l')}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY 1, 2, 3, 4
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def c25_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — the returned-item report: top 20 customers by
    revenue lost to returns in a two-quarter window. The revenue
    aggregate groups on c_custkey BEFORE the row is widened with name /
    balance / nation (those ride the broadcast dims in the same
    grouping key set — functionally dependent, zero extra shuffle), and
    the global top-20 plans as TakeOrderedAndProject (per-partition
    heaps, no full sort). Tie at the revenue boundary broken by
    c_custkey; revenue compares exactly (decimal sum, one double
    cast)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_acctbal", "c_nationkey"
        )
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            "n_nationkey", F.col("n_name").alias("nation")
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "nation")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "c26_shipping_delay_priority",
    oracle="""
    SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 30
                THEN 'FAST'
                WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 90
                THEN 'NORMAL'
                ELSE 'SLOW' END AS ship_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS high_priority_items,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT)
             AS low_priority_items
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def c26_shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — shipping-performance vs order priority: items
    shipped in a year bucketed by order-to-ship delay (the testdata has
    no l_shipmode, so the mode dimension is adapted to FAST/NORMAL/SLOW
    delay classes — same CASE-pivot surface), counting urgent vs other
    orders per bucket. One fact-fact hash join on the order key, then a
    3-group map-side-partial aggregate; day difference is exact (both
    engines diff midnight-NTZ timestamps as whole days)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.when(delay <= 30, "FAST")
            .when(delay <= 90, "NORMAL")
            .otherwise("SLOW")
            .alias("ship_bucket"),
            F.when(is_high, 1).otherwise(0).alias("hi"),
            F.when(is_high, 0).otherwise(1).alias("lo"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum("hi").cast("long").alias("high_priority_items"),
            F.sum("lo").cast("long").alias("low_priority_items"),
        )
    )


@query(
    "c27_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def c27_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — the customer order-count distribution: how
    many customers placed exactly N qualifying orders, INCLUDING the
    zero-order customers (the left outer join with the qualifier in the
    ON clause, not the WHERE — the classic outer-join-semantics trap).
    The orders side pre-aggregates to (custkey, count) before the outer
    join, so the join moves one row per customer, not raw orders; the
    distribution is a second map-side-partial aggregate over customer-
    count rows. No dim is data-proportional broadcast."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    return (
        cust.join(
            per_cust_orders, cust.c_custkey == F.col("o_custkey"), "left"
        )
        .select(F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
    )


@query(
    "c28_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM({_dp_sql('l')}) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def c28_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — the shipping-priority report: the 10 highest-
    value orders from one market segment booked before a cutoff but
    still (partly) unshipped after it. The segment filter prunes the
    customer dim BEFORE its broadcast; lineitem⋈orders is the one
    fact exchange (order key), reused by the per-order revenue
    aggregate; the global top-10 plans as TakeOrderedAndProject. The
    o_orderdate output column stays TIMESTAMP_NTZ end-to-end (the
    verify-skill TZ rule)."""
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp_ntz")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp_ntz")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        orders.join(cust, orders.o_custkey == F.col("c_custkey"), "left_semi")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "c29_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(4,2))
             - CAST(p.p_retailprice AS DECIMAL(18,2))
               * CAST(0.6 AS DECIMAL(2,1))
               * CAST(l.l_quantity AS DECIMAL(4,1))
           ) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey  = l.l_partkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def c29_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-line profit by supplier nation and
    order year. The spec's ps_supplycost has no testdata twin, so cost
    is adapted to 60% of the part's retail price per unit — preserving
    the shape (a revenue-minus-cost measure spanning THREE tables'
    columns, a name-substring dim filter, and a two-level rollup key).
    part (name-filtered) + supplier⋈nation broadcast; the only fact
    exchange is lineitem⋈orders on the order key. The profit term is
    computed per-row in EXACT decimal (retail price is 2-decimal,
    quantity integral — casts are value-preserving; products stay
    under DECIMAL(38)) and summed exactly; one double cast at the
    end."""
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    cost = (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.lit("0.6").cast("decimal(2,1)")
        * F.col("l_quantity").cast("decimal(4,1)")
    )
    return (
        li.join(part, li.l_partkey == F.col("p_partkey"))
        .join(supp, li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            "nation", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(F.sum(_disc_price() - cost).cast("double").alias("profit"))
    )


@query(
    "c30_min_cost_supplier",
    oracle="""
    WITH offer AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY 1, 2
    ),
    best AS (
      SELECT l_partkey, MIN(unit_cost) AS best_cost FROM offer GROUP BY 1
    )
    SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name,
           o.unit_cost AS best_unit_cost
    FROM offer o
    JOIN best b     ON b.l_partkey = o.l_partkey
                   AND o.unit_cost = b.best_cost
    JOIN part p     ON p.p_partkey = o.l_partkey
    JOIN supplier s ON s.s_suppkey = o.l_suppkey
    WHERE p.p_size >= 30 AND p.p_type LIKE 'SMALL%'
    """,
)
def c30_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — the minimum-cost supplier: for each qualifying
    part, the region-local supplier(s) whose offered unit cost equals
    the per-part MINIMUM (the spec's correlated MIN subquery; 'offer'
    adapted to the star schema as min observed l_extendedprice /
    l_quantity per (part, supplier), since the testdata has no
    partsupp). Decorrelated Spark-first: the per-(part, supplier) offer
    pre-aggregation is PERSISTED (the c19 convention) and feeds both
    the per-part minimum and the tie-keeping same-key join, so the
    fact scan and its exchange run once — never a per-row subquery. Region->nation->supplier collapses into one
    pre-filtered broadcast; the part dim filter prunes before its
    broadcast join. Unit cost divides two raw parquet doubles — the
    same IEEE division on both engines, so MIN and the equality tie
    filter are exact."""
    euro_supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").join(
                    load_table(spark, sf_dir, "region").filter(
                        F.col("r_name") == "EUROPE"
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    offer = (
        li.join(euro_supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
        .persist()  # c19 convention: the pre-agg feeds BOTH the per-part
        # minimum and the tie filter — without the cache Catalyst
        # duplicates the whole fact scan + exchange subtree
    )
    best = offer.groupBy(F.col("l_partkey").alias("bk")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") >= 30) & F.col("p_type").like("SMALL%"))
        .select("p_partkey", "p_brand")
    )
    return (
        offer.join(
            best,
            (offer.l_partkey == best.bk)
            & (offer.unit_cost == best.best_cost),
        )
        .join(part, offer.l_partkey == part.p_partkey)
        .select(
            "p_partkey",
            "p_brand",
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            F.col("unit_cost").alias("best_unit_cost"),
        )
    )


@query(
    "c31_dominant_part_suppliers",
    oracle="""
    WITH pq AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
      FROM lineitem GROUP BY 1, 2
    ),
    pt AS (SELECT l_partkey, SUM(sq) AS tq FROM pq GROUP BY 1),
    qual AS (
      SELECT DISTINCT pq.l_suppkey
      FROM pq
      JOIN pt ON pt.l_partkey = pq.l_partkey
      JOIN part p ON p.p_partkey = pq.l_partkey
      WHERE p.p_name LIKE 'small%' AND pq.sq * 10 > pt.tq
    )
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN qual q   ON q.l_suppkey = s.s_suppkey
    WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4',
                       'NATION_5')
    """,
)
def c31_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — 'potential part promotion': suppliers in named
    nations who dominate the supply of some qualifying part (the spec's
    availqty > half-of-shipped nested-subquery chain; adapted to the
    star schema as shipped-share: the supplier moved MORE THAN 10% of
    a 'small%' part's total shipped quantity — an OUTSIZED share, 2x+
    the uniform spread, since the synthetic corpus fans each part
    across ~20 suppliers and the 99th-percentile share is ~11.6%; the
    spec's 50%-of-availqty bound would be vacuous here).
    Decorrelated Spark-first:
    the per-(part, supplier) quantity pre-aggregation is PERSISTED (the
    c19 convention) and feeds both the per-part total and the share
    filter, so the fact scan and its exchange run once; the outsized-share test compares
    two exact decimal sums (sq * 10 > tq — integer-exact, no division);
    the qualifying-supplier set is DISTINCT-collapsed before the final
    semi join so the supplier dim joins one row per candidate. Part and
    nation dims broadcast pre-filtered."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq")
    ).persist()  # feeds both the per-part total and the share filter
    # (c19 convention — one fact scan, not a duplicated subtree)
    pt = pq.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("sq").alias("tq")
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    qual = (
        pq.join(pt, pq.l_partkey == pt.pk)
        .join(part, pq.l_partkey == F.col("p_partkey"), "left_semi")
        .filter(F.col("sq") * 10 > F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    nations = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(
            F.col("n_name").isin(
                "NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"
            )
        )
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        nations, F.col("s_nationkey") == F.col("n_nationkey")
    )
    return supp.join(
        F.broadcast(qual), supp.s_suppkey == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name", F.col("n_name").alias("nation"))


@query(
    "c32_forecast_revenue_change",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             AS revenue_delta,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def c32_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — the forecast-revenue-change scalar: what
    revenue was given away as discount on small-quantity items in one
    shipping year. The simplest classic shape, registered to complete
    the Q1-Q22 analog sweep: a single scan with every predicate pushed
    to the parquet reader (range on l_shipdate, BETWEEN on l_discount,
    bound on l_quantity — all appear in PushedFilters), a map-side
    partial aggregate, and one exact decimal product summed exactly.
    Double literals (0.05/0.07) parse to the identical IEEE values on
    both engines, so the raw-double comparisons agree bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            )
            .cast("double")
            .alias("revenue_delta"),
            F.count("*").cast("long").alias("n_items"),
        )
    )
