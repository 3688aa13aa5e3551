"""Golden tests for the full reference analytics workload
(sql/4.analytics_queries.sql re-expressed) run through the Engine facade
on post-CDC-scenario replicas."""

import pytest
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.engine import Engine
from sfguide_getting_started_openflow_postgresql_cdc_spark.semantic.analytics import (
    ANALYTICS,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources import healthcare
from sfguide_getting_started_openflow_postgresql_cdc_spark.streaming.cdc import ENVELOPE

# driver-budget default excludes this heavyweight suite (pytest.ini);
# builders run it via `-m ""` before shipping engine changes
pytestmark = pytest.mark.slow

LOAD_TS = "2024-06-02 12:00:00"


def _stringify(v):
    import datetime as dt

    if v is None:
        return None
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    eng = Engine(
        spark, str(tmp_path_factory.mktemp("wh_analytics")), write_partitions=1
    )
    eng.bootstrap(load_ts=LOAD_TS)
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
    return eng


# queries that may legitimately return zero rows at scenario END (all
# checked-in patients have been seen by close of the scripted day)
_MAY_BE_EMPTY = {"patients_in_clinic"}


@pytest.mark.parametrize("name", sorted(ANALYTICS))
def test_analytics_query_runs(engine, name):
    df = engine.analytics(name)
    rows = df.collect()
    assert df.schema.fields, name
    if name not in _MAY_BE_EMPTY:
        assert rows, f"{name} returned no rows"


def test_patients_in_clinic_mid_scenario(spark, tmp_path):
    """The in-clinic dashboard must show patients while the morning wave
    is mid-flight (after check-ins, before completions)."""
    eng = Engine(spark, str(tmp_path / "wh_mid"), write_partitions=1)
    eng.bootstrap(load_ts=LOAD_TS)
    snap = healthcare.generate_snapshot()
    batches = healthcare.generate_scenario(snap)
    for batch in batches[:2]:  # walk-ins + the confirm/check-in/start wave
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
    rows = eng.analytics("patients_in_clinic").collect()
    assert rows, "mid-morning there are checked-in/in-progress patients"
    assert {r["status"] for r in rows} <= {"checked_in", "in_progress"}
    assert all(r["doctor_name"] and r["patient_name"] for r in rows)


def test_current_day_status_golden(engine):
    rows = {r["status"]: r for r in engine.analytics("current_day_status").collect()}
    # scenario day: walk-ins + urgent + future inserts land on AS_OF; all
    # percentages sum to 100
    total_pct = sum(float(r["percentage"]) for r in rows.values())
    assert abs(total_pct - 100.0) < 0.5
    assert "completed" in rows
    for r in rows.values():
        assert r["time_slots"]  # listagg produced slots


def test_doctor_availability_covers_all_doctors(engine):
    rows = engine.analytics("doctor_availability_today").collect()
    assert len(rows) == 10  # LEFT JOIN keeps idle doctors
    assert any(r["total_appointments_today"] == 0 for r in rows) or all(
        r["total_appointments_today"] >= 0 for r in rows
    )


def test_patient_demographics_partition_patients(engine):
    rows = engine.analytics("patient_demographics").collect()
    assert sum(r["patient_count"] for r in rows) == 100  # every patient bucketed


def test_revenue_by_department_shares_sum_to_100(engine):
    rows = engine.analytics("revenue_by_department").collect()
    assert abs(sum(float(r["revenue_percentage"]) for r in rows) - 100.0) < 0.5
    # revenue ordered desc
    revs = [float(r["total_revenue"]) for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_cdc_change_volume_golden(engine):
    rows = {r["table_name"]: r for r in engine.analytics("cdc_change_volume").collect()}
    assert rows["appointments"]["deleted"] == 2
    # the morning wave prefers same-day SNAPSHOT appointments (lowest ids
    # first), so 8 of the 10 live inserts end the day untouched
    assert rows["appointments"]["insert_only"] == 8
    assert rows["visits"]["insert_only"] == 4  # scenario visit inserts


def test_executive_summary_consistency(engine):
    row = engine.analytics("executive_summary").collect()[0]
    assert row["total_appointments"] > 0
    assert row["completed_appointments"] <= row["total_appointments"]
    assert 0 <= float(row["completion_rate"]) <= 100
    assert row["total_revenue"] is not None


def test_engine_sql_surface(engine):
    df = engine.sql(
        "SELECT status, COUNT(*) AS n FROM appointments GROUP BY status"
    )
    counts = {r["status"]: r["n"] for r in df.collect()}
    assert counts["completed"] >= 100


def test_engine_verified_queries(engine):
    assert engine.verified("total_appointments").collect()[0][0] == 178
    rows = engine.verified("revenue_by_doctor").collect()
    assert len(rows) == 10


def test_engine_history_surface(engine):
    hist = engine.history("doctors")
    d9 = hist.filter(F.col("doctor_id") == 9).orderBy("version").collect()
    assert len(d9) == 2  # snapshot + the accepting_new_patients update
    assert d9[0]["accepting_new_patients"] is True
    assert d9[1]["accepting_new_patients"] is False
    assert d9[1]["is_current"]
