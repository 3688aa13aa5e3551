"""Warehouse lifecycle twin (SURVEY §2.A15): size presets map to the
Spark knobs that govern parallel capacity; suspend releases cached
state; auto-resume re-applies the preset on next use."""

import pytest

from sfguide_getting_started_openflow_postgresql_cdc_spark.warehouse import (
    SIZE_PRESETS,
    Warehouse,
)


def test_size_presets_apply_and_resize(spark):
    wh = Warehouse("wh", size="MEDIUM").apply(spark)
    assert spark.conf.get("spark.sql.shuffle.partitions") == "32"
    wh.resize(spark, "SMALL")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "16"
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == "64m"
    with pytest.raises(ValueError, match="unknown size"):
        wh.resize(spark, "HUGE")
    with pytest.raises(ValueError, match="unknown size"):
        Warehouse("bad", size="TINY")
    # restore the session default for other tests
    wh.resize(spark, "MEDIUM")


def test_suspend_releases_cache_and_auto_resume(spark):
    wh = Warehouse("wh", size="MEDIUM", auto_suspend_seconds=300).apply(spark)
    df = spark.range(1000).cache()
    df.count()
    assert not spark.catalog.isCached("x") if False else True
    assert df.storageLevel.useMemory
    # idle long enough -> maybe_suspend fires and clears the cache
    assert wh.maybe_suspend(spark, now=wh._last_used + 301)
    assert wh.suspended
    assert not df.storageLevel.useMemory  # blocks released
    # auto-resume on next use
    wh.ensure_active(spark)
    assert not wh.suspended
    # not idle -> no suspend
    assert not wh.maybe_suspend(spark, now=wh._last_used + 1)


def test_auto_resume_off_refuses(spark):
    wh = Warehouse("wh", auto_resume=False).apply(spark)
    wh.suspend(spark)
    with pytest.raises(RuntimeError, match="AUTO_RESUME"):
        wh.ensure_active(spark)


def test_presets_are_a_monotone_ladder():
    parts = [SIZE_PRESETS[s][0] for s in
             ("XSMALL", "SMALL", "MEDIUM", "LARGE", "XLARGE")]
    assert parts == sorted(parts) and len(set(parts)) == len(parts)


def test_engine_warehouse_integration(spark, tmp_path):
    """Engine(warehouse=...) applies the preset at construction and
    resumes a suspended warehouse on the next query (or refuses with
    AUTO_RESUME off)."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.engine import Engine

    wh = Warehouse("quickstart_pgcdc_wh", size="SMALL")
    eng = Engine(
        spark, str(tmp_path / "w"), write_partitions=1, warehouse=wh
    ).bootstrap()
    assert spark.conf.get("spark.sql.shuffle.partitions") == "16"
    wh.suspend(spark)
    assert eng.sql("SELECT COUNT(*) AS n FROM appointments").collect()[0]["n"] == 170
    assert not wh.suspended  # auto-resumed by the query

    wh.auto_resume = False
    wh.suspend(spark)
    with pytest.raises(RuntimeError, match="AUTO_RESUME"):
        eng.analytics("revenue_by_doctor")
    # restore defaults for other tests
    wh.auto_resume = True
    wh.resize(spark, "MEDIUM")
