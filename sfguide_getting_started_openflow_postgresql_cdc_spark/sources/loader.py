"""Batch readers for the driver's parquet testdata.

Equivalent to the reference's snapshot read path (the OpenFlow connector's
initial full-table copy, ``sql/1.snowflake_setup.sql:47-49``) but over
columnar parquet: Catalyst pushes predicates and prunes columns into the
scan, so callers should express filters/projections declaratively and
never pre-materialize.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Plain parquet read — schema comes from the
    file footer; filters/projections applied later push down into this scan.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which the vectorized Spark
    reader rejects; read it as raw nanos (legacy conf) and truncate to
    microseconds with integer division (nanos exceed 2^53 — float division
    would corrupt them). Matches DuckDB's ns->us truncation, so oracle
    comparisons agree.
    """
    # The driver may hand us a session it built itself; timestamp
    # semantics (cast-to-date, date_trunc, collect) must be UTC to match
    # the TZ-naive warehouse/oracle, so pin it defensively here.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # -> timestamp_ntz: every other testdata timestamp reads as NTZ
            # (and the reference's warehouse type is TIMESTAMP_NTZ); NTZ
            # collect/display is process-TZ-independent.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register testdata tables as temp views for the SQL API surface."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
