"""Snapshot-source resolution (SURVEY A12): DataFrame passthrough,
parquet paths, and the jdbc: branch (reader construction verified via a
mock — the sandbox hosts no live database, matching SURVEY §2.A note)."""

import pytest
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import (
    load_jdbc_table,
    load_snapshot_source,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("balance", T.DoubleType(), True),
    ]
)


class _FakeReader:
    def __init__(self, log):
        self.log = log

    def format(self, fmt):
        self.log["format"] = fmt
        return self

    def option(self, k, v):
        self.log.setdefault("options", {})[k] = v
        return self

    def load(self):
        self.log["loaded"] = True
        return self.log["sentinel"]


@pytest.fixture()
def fake_read(monkeypatch, spark):
    log = {"sentinel": object()}
    monkeypatch.setattr(
        SparkSession, "read", property(lambda self: _FakeReader(log))
    )
    return log


def test_jdbc_branch_enforces_schema_and_partitioning(spark, fake_read):
    out = load_jdbc_table(
        spark,
        "jdbc:postgresql://db:5432/healthcare",
        "public.patients",
        SCHEMA,
        partition_column="id",
        lower_bound=1,
        upper_bound=1_000_000,
        num_partitions=64,
    )
    assert out is fake_read["sentinel"]
    opts = fake_read["options"]
    assert fake_read["format"] == "jdbc"
    assert opts["url"].startswith("jdbc:postgresql://")
    assert opts["dbtable"] == "public.patients"
    # declared types enforced, never inferred from the remote catalog
    assert opts["customSchema"] == "id bigint, name string, balance double"
    # range-partitioned parallel snapshot
    assert opts["partitionColumn"] == "id"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "1000000")
    assert opts["numPartitions"] == "64"


def test_jdbc_partitioning_requires_bounds(spark, fake_read):
    with pytest.raises(ValueError, match="requires lower_bound"):
        load_jdbc_table(
            spark, "jdbc:postgresql://db/x", "t", SCHEMA, partition_column="id"
        )


def test_snapshot_source_dispatch(spark, fake_read):
    jdbc_df = load_snapshot_source(spark, "jdbc:h2:mem:db", "patients", SCHEMA)
    assert jdbc_df is fake_read["sentinel"]
    with pytest.raises(TypeError, match="unsupported snapshot source"):
        load_snapshot_source(spark, 42, "patients", SCHEMA)


def test_snapshot_source_parquet_path(spark):
    df = load_snapshot_source(
        spark, "/root/testdata/sf0.001/nation.parquet", "nation", None
    )
    assert isinstance(df, DataFrame)
    assert df.count() == 25


def test_bootstrap_accepts_parquet_path_sources(spark, tmp_path):
    """End-to-end: CdcEngine.bootstrap with a string (parquet) source."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.streaming.cdc import (
        CdcEngine,
        ReplicaStore,
    )

    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType(), False),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.LongType(), True),
        ]
    )
    eng = CdcEngine(
        ReplicaStore(str(tmp_path / "wh")),
        tables={"nation": schema},
        primary_keys={"nation": "n_nationkey"},
        write_partitions=1,
    )
    eng.bootstrap(
        spark,
        {"nation": "/root/testdata/sf0.001/nation.parquet"},
        "2024-06-02 12:00:00",
        journal_snapshot=False,
    )
    assert eng.store.read(spark, "nation").count() == 25
