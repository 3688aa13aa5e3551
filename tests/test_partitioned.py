"""Partitioned layout + pruning (sources/partitioned.py): a partition
predicate must become directory pruning (PartitionFilters, zero
non-matching files read), and a filtered dim join over a partitioned
fact must plan Dynamic Partition Pruning."""

import os

import pyspark.sql.functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.plans.inspect import (
    explain_str,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import (
    load_table,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.partitioned import (
    read_partitioned,
    write_partitioned,
)


def test_partition_filter_prunes_directories(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, "lang")

    # the layout is one directory per lang
    langs = sorted(
        d.split("=")[1] for d in os.listdir(path) if d.startswith("lang=")
    )
    assert len(langs) >= 2

    df = read_partitioned(spark, path).filter(F.col("lang") == langs[0])
    plan = explain_str(df)
    assert "PartitionFilters" in plan and "lang" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0], plan
    # the answer matches the unpartitioned table
    want = docs.filter(F.col("lang") == langs[0]).count()
    assert df.count() == want


def test_dynamic_partition_pruning_on_dim_join(spark, sf_dir, tmp_path):
    """A selective filter on the dim side must prune the partitioned
    fact at RUNTIME (dynamicpruning expression in the fact scan) — the
    lever that turns a 100 TB fact-dim join into a scan of only the
    partitions the dim filter selects."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_partitioned(orders, path, "o_year")

    # DPP preconditions (learned by probing): the dim side needs a
    # SELECTIVE predicate (a bare literal table has no Filter node ->
    # no pruning subquery), the join column type must match the
    # directory-inferred partition type (int, not long — a cast around
    # the partition column blocks pruning), and with the default
    # reuseBroadcastOnly=true the join must be a broadcast join.
    years = spark.createDataFrame(
        [(1995, "keep"), (1996, "drop")], ["y", "tag"]
    ).select(F.col("y").cast("int").alias("o_year"), "tag")
    dim = years.filter(F.col("tag") == "keep")
    fact = read_partitioned(spark, path)
    joined = fact.join(F.broadcast(dim), "o_year").groupBy("tag").agg(
        F.count("*").alias("n")
    )
    plan = explain_str(joined)
    assert "dynamicpruningexpression" in plan.lower(), plan
    n = joined.collect()[0]["n"]
    want = orders.filter(F.col("o_year") == 1995).count()
    assert n == want
