"""Approximate-sketch operators must land within documented error bounds
of their exact twins, and the salted join must be semantics-preserving."""

from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.functions.skew import (
    salted_join,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.operators import QUERIES
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import load_table

SF = "/root/testdata/sf0.01"


def test_approx_sketches_within_error_bounds(spark):
    approx = {r["o_orderstatus"]: r for r in QUERIES["d15_approx_sketches"](spark, SF).collect()}
    exact = {r["o_orderstatus"]: r for r in QUERIES["d6_count_distinct"](spark, SF).collect()}
    exact_p = {r["o_orderstatus"]: r for r in QUERIES["d14_exact_percentiles"](spark, SF).collect()}
    for status, row in approx.items():
        true_n = exact[status]["n_customers"]
        assert abs(row["approx_customers"] - true_n) <= max(3, 0.05 * true_n)
        true_med = exact_p[status]["median_price"]
        assert abs(row["approx_median_price"] - true_med) / true_med < 0.02


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    big = orders.withColumnRenamed("o_custkey", "c_custkey")
    salted = (
        salted_join(big, customer, "c_custkey", salt=4)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_preserves_unmatched(spark):
    customer = load_table(spark, SF, "customer").select("c_custkey")
    orders = load_table(spark, SF, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey"
    )
    out = salted_join(customer, orders, "c_custkey", salt=4, how="left")
    n_customers = out.select("c_custkey").distinct().count()
    assert n_customers == customer.count()  # no left rows lost


def test_salted_join_rejects_full(spark):
    import pytest

    customer = load_table(spark, SF, "customer")
    with pytest.raises(ValueError):
        salted_join(customer, customer, "c_custkey", how="full")
