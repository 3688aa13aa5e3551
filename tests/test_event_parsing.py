"""Robustness of the CDC envelope parser: malformed payloads must
degrade to nulls (quarantine-able), never crash the merge."""

from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.streaming.cdc import (
    ENVELOPE,
    CdcEngine,
    ReplicaStore,
)


def _engine(tmp_path):
    return CdcEngine(ReplicaStore(str(tmp_path / "wh")), write_partitions=1)


def test_project_after_bad_values_become_null(spark, tmp_path):
    eng = _engine(tmp_path)
    rows = [
        (
            1,
            "2024-06-03 08:00:00",
            "doctors",
            "I",
            {
                "doctor_id": "not-a-number",   # bad long
                "first_name": "A",
                "last_name": "B",
                "specialization": "GP",
                "years_of_experience": "12.9",  # non-integer string
                "accepting_new_patients": "yes-please",  # bad boolean
            },
        )
    ]
    typed = eng.project_after(spark.createDataFrame(rows, ENVELOPE), "doctors")
    r = typed.collect()[0]
    assert r["doctor_id"] is None
    assert r["first_name"] == "A"
    assert r["accepting_new_patients"] is None
    assert r["department"] is None  # absent key -> null
    assert r["seq_no"] == 1 and r["op"] == "I"


def test_merge_survives_unknown_table_and_extra_keys(spark, tmp_path):
    eng = _engine(tmp_path)
    from sfguide_getting_started_openflow_postgresql_cdc_spark.sources import healthcare

    eng.bootstrap(spark, healthcare.snapshot_dataframes(spark), "2024-06-02 12:00:00")
    rows = [
        # unknown table -> skipped by apply_envelope_batch
        (1, "2024-06-03 08:00:00", "not_a_table", "I", {"x": "1"}),
        # extra unknown key in after -> ignored by projection
        (
            2,
            "2024-06-03 08:00:01",
            "doctors",
            "U",
            {"doctor_id": "1", "first_name": "Zed", "last_name": "Q",
             "specialization": "GP", "mystery_column": "42"},
        ),
    ]
    eng.apply_envelope_batch(spark, spark.createDataFrame(rows, ENVELOPE))
    d1 = (
        eng.store.read(spark, "doctors")
        .filter(F.col("doctor_id") == 1)
        .collect()[0]
    )
    assert d1["first_name"] == "Zed"
    assert eng.store.read(spark, "doctors").count() == 10
