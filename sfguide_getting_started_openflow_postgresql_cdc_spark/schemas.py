"""Explicit StructType schemas for every table the engine touches.

The reference declares schemas twice — PostgreSQL DDL
(``/root/reference/sql/0.init_healthcare.sql:43-103``) and the semantic
model (``semantic-models/healthcare_cdc_semantic_model.yaml``). We follow
the same discipline: never rely on inference. Type mappings per
SURVEY.md §1.2; notably PostgreSQL TIME -> ``'HH:mm:ss'`` strings
(lexical order == time order) since Spark has no TIME type, and
TIMESTAMP (no tz) -> TimestampType with a pinned UTC session timezone.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Healthcare source tables (reference: sql/0.init_healthcare.sql:43-103)
# --------------------------------------------------------------------------

PATIENTS = T.StructType(
    [
        T.StructField("patient_id", T.LongType(), False),
        T.StructField("first_name", T.StringType(), False),
        T.StructField("last_name", T.StringType(), False),
        T.StructField("date_of_birth", T.DateType(), False),
        T.StructField("phone", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("insurance_provider", T.StringType(), True),
        T.StructField("registration_date", T.TimestampType(), True),
    ]
)

DOCTORS = T.StructType(
    [
        T.StructField("doctor_id", T.LongType(), False),
        T.StructField("first_name", T.StringType(), False),
        T.StructField("last_name", T.StringType(), False),
        T.StructField("specialization", T.StringType(), False),
        T.StructField("department", T.StringType(), True),
        T.StructField("phone", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("years_of_experience", T.LongType(), True),
        T.StructField("accepting_new_patients", T.BooleanType(), True),
    ]
)

# appointment_time: PostgreSQL TIME -> 'HH:mm:ss' string (SURVEY.md §1.2).
APPOINTMENTS = T.StructType(
    [
        T.StructField("appointment_id", T.LongType(), False),
        T.StructField("patient_id", T.LongType(), False),
        T.StructField("doctor_id", T.LongType(), False),
        T.StructField("appointment_date", T.DateType(), False),
        T.StructField("appointment_time", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("reason_for_visit", T.StringType(), True),
        T.StructField("appointment_type", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

VISITS = T.StructType(
    [
        T.StructField("visit_id", T.LongType(), False),
        T.StructField("appointment_id", T.LongType(), False),
        T.StructField("patient_id", T.LongType(), False),
        T.StructField("doctor_id", T.LongType(), False),
        T.StructField("visit_date", T.DateType(), False),
        T.StructField("visit_start_time", T.TimestampType(), True),
        T.StructField("visit_end_time", T.TimestampType(), True),
        T.StructField("diagnosis", T.StringType(), True),
        T.StructField("treatment_notes", T.StringType(), True),
        T.StructField("follow_up_required", T.BooleanType(), True),
        T.StructField("prescription_given", T.BooleanType(), True),
        T.StructField("total_charge", T.DecimalType(10, 2), True),
    ]
)

HEALTHCARE_TABLES: dict[str, T.StructType] = {
    "patients": PATIENTS,
    "doctors": DOCTORS,
    "appointments": APPOINTMENTS,
    "visits": VISITS,
}

PRIMARY_KEYS: dict[str, str] = {
    "patients": "patient_id",
    "doctors": "doctor_id",
    "appointments": "appointment_id",
    "visits": "visit_id",
}

# CHECK-enum constraints (reference: sql/0.init_healthcare.sql:77,79) —
# recorded for validation/data-gen, not enforced at write time.
APPOINTMENT_STATUSES = (
    "scheduled",
    "confirmed",
    "checked_in",
    "in_progress",
    "completed",
    "cancelled",
    "no_show",
)
APPOINTMENT_TYPES = ("routine", "urgent", "follow_up", "annual")

# --------------------------------------------------------------------------
# CDC replica metadata (reference: sql/2.verify_snapshot.sql:41-49,
# semantic model yaml:111-143). Added to every replica table.
# --------------------------------------------------------------------------

META_INSERTED_AT = "_SNOWFLAKE_INSERTED_AT"
META_UPDATED_AT = "_SNOWFLAKE_UPDATED_AT"
META_DELETED = "_SNOWFLAKE_DELETED"
META_FIELDS = [
    T.StructField(META_INSERTED_AT, T.TimestampType(), True),
    T.StructField(META_UPDATED_AT, T.TimestampType(), True),
    T.StructField(META_DELETED, T.BooleanType(), True),
]


def replica_schema(source: T.StructType) -> T.StructType:
    """Target schema = source schema + the three CDC metadata columns
    (the connector contract, sql/1.snowflake_setup.sql:47-49)."""
    return T.StructType(list(source.fields) + list(META_FIELDS))


def change_event_schema(source: T.StructType) -> T.StructType:
    """Envelope for one table's row-level change events (SURVEY.md §3
    entry 2): (seq_no, event_ts, table_name, op in {I,U,D}, after)."""
    return T.StructType(
        [
            T.StructField("seq_no", T.LongType(), False),
            T.StructField("event_ts", T.TimestampType(), False),
            T.StructField("table_name", T.StringType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("after", source, True),
        ]
    )


# --------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md / FIXTURES.md §C) — TPC-H-ish.
# Parquet already carries these; declared here for validation and for
# streaming reads (readStream requires an explicit schema).
# --------------------------------------------------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
