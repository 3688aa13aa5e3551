"""Snapshot verification report (reference sql/2.verify_snapshot.sql)."""

import pytest
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    return Engine(
        spark, str(tmp_path_factory.mktemp("wh_verif")), write_partitions=1
    ).bootstrap()


def test_snapshot_verification_all_pass(engine):
    rep = engine.verify_snapshot()
    rows = rep.collect()
    failed = [r for r in rows if not r["passed"]]
    assert not failed, failed
    cats = {r["category"] for r in rows}
    assert cats == {
        "row_counts",
        "cdc_metadata",
        "null_checks",
        "status_distribution",
        "referential_integrity",
    }
    assert len(rows) >= 30


def test_verification_detects_bad_expectations(engine):
    rep = engine.verify_snapshot(expected_counts={"patients": 99, "doctors": 10})
    failed = {r["check_name"] for r in rep.collect() if not r["passed"]}
    assert "patients.count" in failed
    assert "doctors.count" not in failed


def test_post_cdc_verification_mode(spark, tmp_path):
    """After live changes, snapshot-only invariants are relaxed and counts
    are caller-supplied."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.sources import healthcare
    from sfguide_getting_started_openflow_postgresql_cdc_spark.streaming.cdc import (
        ENVELOPE,
    )
    from tests.test_analytics import _stringify

    eng = Engine(spark, str(tmp_path / "wh"), write_partitions=1).bootstrap()
    snap = healthcare.generate_snapshot()
    for batch in healthcare.generate_scenario(snap):
        rows = [
            (
                ev.seq_no,
                ev.event_ts.isoformat(sep=" "),
                ev.table_name,
                ev.op,
                {k: _stringify(v) for k, v in ev.after.items()},
            )
            for ev in batch
        ]
        eng.apply_batch(spark.createDataFrame(rows, ENVELOPE))
    rep = eng.verify_snapshot(
        expected_counts={
            "patients": 100,
            "doctors": 10,
            "appointments": 180,
            "visits": 104,
        },
        snapshot_only=False,
    )
    failed = [r for r in rep.collect() if not r["passed"]]
    assert not failed, failed
