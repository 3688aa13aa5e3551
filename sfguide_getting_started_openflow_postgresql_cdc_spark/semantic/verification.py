"""Replication verification report — the reference's
``sql/2.verify_snapshot.sql`` as an engine surface.

Produces one row per check: (category, check_name, expected, actual,
passed). Every check is a distributed aggregation; only the scalar
results come back to the driver, so the report costs one pass over each
table regardless of scale.

Check families (reference citations):
- golden row counts            (sql/2.verify_snapshot.sql:19-35)
- CDC metadata invariants      (:37-49)
- data-quality null checks     (:85-119)
- status distribution          (:121-137)
- referential integrity        (the FK contract of sql/0.init:82-102)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark import schemas

SNAPSHOT_GOLDEN_COUNTS = {
    "patients": 100,
    "doctors": 10,
    "appointments": 170,
    "visits": 100,
}

SNAPSHOT_STATUS_DISTRIBUTION = {
    "completed": 100,
    "cancelled": 40,
    "scheduled": 15,
    "no_show": 10,
    "confirmed": 5,
}

_NULL_CHECKS = [
    ("patients", "first_name"),
    ("patients", "last_name"),
    ("patients", "date_of_birth"),
    ("doctors", "specialization"),
    ("appointments", "patient_id"),
    ("appointments", "doctor_id"),
    ("appointments", "appointment_date"),
    ("appointments", "status"),
    ("visits", "appointment_id"),
    ("visits", "total_charge"),
]

_FK_CHECKS = [
    ("appointments", "patient_id", "patients", "patient_id"),
    ("appointments", "doctor_id", "doctors", "doctor_id"),
    ("visits", "appointment_id", "appointments", "appointment_id"),
    ("visits", "patient_id", "patients", "patient_id"),
    ("visits", "doctor_id", "doctors", "doctor_id"),
]


@dataclass
class Check:
    category: str
    name: str
    expected: str
    actual: str

    @property
    def passed(self) -> bool:
        return self.expected == self.actual


def run_checks(
    dfs_raw: dict[str, DataFrame],
    expected_counts: dict[str, int] | None = None,
    expected_status: dict[str, int] | None = None,
    snapshot_only: bool = True,
) -> list[Check]:
    """Run the verification suite against RAW replicas (deleted rows
    included — counts match the reference's post-snapshot expectations
    when ``snapshot_only``)."""
    expected_counts = expected_counts or SNAPSHOT_GOLDEN_COUNTS
    checks: list[Check] = []

    # golden counts + metadata invariants, one agg pass per table
    for table, want in expected_counts.items():
        df = dfs_raw[table]
        row = df.agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col(schemas.META_INSERTED_AT).isNull(), 1)).alias(
                "null_ins"
            ),
            F.count(F.when(F.col(schemas.META_UPDATED_AT).isNotNull(), 1)).alias(
                "updated"
            ),
            F.count(F.when(F.col(schemas.META_DELETED), 1)).alias("deleted"),
        ).collect()[0]
        checks.append(Check("row_counts", f"{table}.count", str(want), str(row["n"])))
        checks.append(
            Check(
                "cdc_metadata",
                f"{table}.inserted_at_never_null",
                "0",
                str(row["null_ins"]),
            )
        )
        if snapshot_only:
            checks.append(
                Check(
                    "cdc_metadata",
                    f"{table}.updated_at_null_after_snapshot",
                    "0",
                    str(row["updated"]),
                )
            )
            checks.append(
                Check(
                    "cdc_metadata", f"{table}.no_deletes_after_snapshot",
                    "0", str(row["deleted"]),
                )
            )

    # data-quality nulls (all must be zero)
    for table, col in _NULL_CHECKS:
        n = (
            dfs_raw[table]
            .agg(F.count(F.when(F.col(col).isNull(), 1)).alias("n"))
            .collect()[0]["n"]
        )
        checks.append(Check("null_checks", f"{table}.{col}_nulls", "0", str(n)))

    # status distribution
    if snapshot_only:
        expected_status = expected_status or SNAPSHOT_STATUS_DISTRIBUTION
        got = {
            r["status"]: r["n"]
            for r in dfs_raw["appointments"]
            .groupBy("status")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for status, want in expected_status.items():
            checks.append(
                Check(
                    "status_distribution",
                    f"appointments.status.{status}",
                    str(want),
                    str(got.get(status, 0)),
                )
            )

    # referential integrity: no orphaned FKs (left-anti must be empty)
    for child, fk, parent, pk in _FK_CHECKS:
        parent_keys = dfs_raw[parent].select(F.col(pk).alias("__parent_key"))
        orphans = (
            dfs_raw[child]
            .join(
                parent_keys,
                dfs_raw[child][fk] == F.col("__parent_key"),
                "left_anti",
            )
            .count()
        )
        checks.append(
            Check(
                "referential_integrity",
                f"{child}.{fk}_orphans",
                "0",
                str(orphans),
            )
        )
    return checks


def report(spark: SparkSession, checks: list[Check]) -> DataFrame:
    return spark.createDataFrame(
        [(c.category, c.name, c.expected, c.actual, c.passed) for c in checks],
        "category string, check_name string, expected string, actual string, passed boolean",
    )
