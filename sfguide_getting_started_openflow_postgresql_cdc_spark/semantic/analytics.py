"""The reference's full analytics workload (sql/4.analytics_queries.sql)
re-expressed Spark-first over the CDC replica tables.

Every builder takes ``(dfs, as_of)`` where ``dfs`` maps table name ->
replica DataFrame (soft-delete-filtered unless the query audits CDC
metadata) and ``as_of`` is the pinned "today" (SURVEY.md §4 deterministic
now). Monetary aggregates run on the DecimalType(10,2) ``total_charge``
column — exact, order-independent. Reference line citations on each
builder; all shapes map to Catalyst built-ins (broadcast dim joins,
partial aggs, %-of-total windows, top-k).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sfguide_getting_started_openflow_postgresql_cdc_spark import schemas
from sfguide_getting_started_openflow_postgresql_cdc_spark.functions.shims import (
    listagg_distinct_ordered,
    nullif_zero,
    pct_of,
    sf_datediff_year,
    sf_dayname,
    sf_dayofweek,
    sf_timestampdiff_minute,
)

AnalyticsFn = Callable[..., DataFrame]
ANALYTICS: dict[str, AnalyticsFn] = {}


def analytics_query(name: str):
    def deco(fn: AnalyticsFn) -> AnalyticsFn:
        ANALYTICS[name] = fn
        return fn

    return deco


def _as_of_col(as_of: dt.date):
    return F.lit(as_of.isoformat()).cast("date")


def _days_back(as_of: dt.date, n: int):
    return F.date_sub(_as_of_col(as_of), n)


def _full_name(prefix: str):
    return F.concat(
        F.col(f"{prefix}.first_name"), F.lit(" "), F.col(f"{prefix}.last_name")
    )


# -- 1. Real-time operational dashboards ------------------------------------


@analytics_query("current_day_status")
def current_day_status(dfs, as_of: dt.date) -> DataFrame:
    """Current-day appointment status + time slots (ref sql/4:31-41)."""
    a = dfs["appointments"].filter(F.col("appointment_date") == _as_of_col(as_of))
    counts = a.groupBy("status").agg(
        F.count("*").alias("appointment_count"),
        listagg_distinct_ordered(
            F.substring("appointment_time", 1, 5), ", "
        ).alias("time_slots"),
    )
    total = F.sum("appointment_count").over(Window.partitionBy())
    return counts.withColumn(
        "percentage", F.round(pct_of(F.col("appointment_count"), total), 1)
    ).orderBy(F.col("appointment_count").desc())


@analytics_query("patients_in_clinic")
def patients_in_clinic(dfs, as_of: dt.date) -> DataFrame:
    """Patients currently checked in / in progress (ref sql/4:43-61):
    3-way join + composed-timestamp wait minutes."""
    as_of_ts = F.lit(f"{as_of.isoformat()} 12:00:00").cast("timestamp_ntz")
    a = dfs["appointments"].alias("a")
    p = dfs["patients"].alias("p")
    d = dfs["doctors"].alias("d")
    appt_ts = F.to_timestamp(
        F.concat(
            F.date_format("a.appointment_date", "yyyy-MM-dd"),
            F.lit(" "),
            F.col("a.appointment_time"),
        )
    ).cast("timestamp_ntz")
    return (
        a.filter(
            (F.col("a.appointment_date") == _as_of_col(as_of))
            & F.col("a.status").isin("checked_in", "in_progress")
        )
        .join(F.broadcast(p), F.col("a.patient_id") == F.col("p.patient_id"))
        .join(F.broadcast(d), F.col("a.doctor_id") == F.col("d.doctor_id"))
        .select(
            _full_name("p").alias("patient_name"),
            F.col("p.phone").alias("phone"),
            _full_name("d").alias("doctor_name"),
            F.col("d.specialization").alias("specialization"),
            F.col("a.appointment_time").alias("appointment_time"),
            F.col("a.status").alias("status"),
            F.col("a.reason_for_visit").alias("reason_for_visit"),
            sf_timestampdiff_minute(appt_ts, as_of_ts).alias(
                "minutes_since_appointment"
            ),
        )
        .orderBy(F.col("status").desc(), F.col("appointment_time"))
    )


@analytics_query("doctor_availability_today")
def doctor_availability_today(dfs, as_of: dt.date) -> DataFrame:
    """Doctor availability dashboard (ref sql/4:63-77): LEFT JOIN with the
    date condition in ON (doctors with no appointments survive)."""
    d = dfs["doctors"].alias("d")
    a = dfs["appointments"].alias("a")
    cond = (F.col("d.doctor_id") == F.col("a.doctor_id")) & (
        F.col("a.appointment_date") == _as_of_col(as_of)
    )
    s = F.col("a.status")
    return (
        d.join(a, cond, "left")
        .groupBy(
            F.col("d.doctor_id").alias("doctor_id"),
            _full_name("d").alias("doctor_name"),
            F.col("d.specialization").alias("specialization"),
            F.col("d.department").alias("department"),
            F.col("d.accepting_new_patients").alias("accepting_new_patients"),
        )
        .agg(
            F.count(F.when(s == "completed", 1)).alias("completed_today"),
            F.count(F.when(s == "in_progress", 1)).alias("currently_seeing"),
            F.count(F.when(s.isin("confirmed", "checked_in"), 1)).alias("waiting"),
            F.count("a.appointment_id").alias("total_appointments_today"),
        )
        .orderBy(F.col("total_appointments_today").desc(), F.col("doctor_id"))
    )


# -- 2. Patient flow ---------------------------------------------------------


@analytics_query("avg_wait_by_date")
def avg_wait_by_date(dfs, as_of: dt.date) -> DataFrame:
    """Average minutes between created_at and updated_at for closed
    appointments (ref sql/4:83-95)."""
    a = dfs["appointments"]
    return (
        a.filter(
            F.col("status").isin("completed", "cancelled", "no_show")
            & (F.col("created_at") != F.col("updated_at"))
            & (F.col("appointment_date") >= _days_back(as_of, 30))
        )
        .groupBy("appointment_date")
        .agg(
            F.avg(
                sf_timestampdiff_minute(F.col("created_at"), F.col("updated_at"))
            ).alias("avg_minutes_to_update"),
            F.count("*").alias("appointments"),
        )
        .orderBy(F.col("appointment_date").desc())
        .limit(30)
    )


@analytics_query("completion_rate_daily")
def completion_rate_daily(dfs, as_of: dt.date) -> DataFrame:
    """Daily completion/no-show rates, last 30 days (ref sql/4:97-120)."""
    a = dfs["appointments"].filter(
        (F.col("appointment_date") >= _days_back(as_of, 30))
        & (F.col("appointment_date") <= _as_of_col(as_of))
    )
    s = F.col("status")
    m = a.groupBy("appointment_date").agg(
        F.count("*").alias("total_appointments"),
        F.sum(F.when(s == "completed", 1).otherwise(0)).alias("completed"),
        F.sum(F.when(s == "cancelled", 1).otherwise(0)).alias("cancelled"),
        F.sum(F.when(s == "no_show", 1).otherwise(0)).alias("no_shows"),
    )
    return m.select(
        "appointment_date",
        "total_appointments",
        "completed",
        "cancelled",
        "no_shows",
        F.round(
            F.col("completed") * 100.0 / nullif_zero(F.col("total_appointments")), 1
        ).alias("completion_rate"),
        F.round(
            F.col("no_shows") * 100.0 / nullif_zero(F.col("total_appointments")), 1
        ).alias("no_show_rate"),
    ).orderBy(F.col("appointment_date").desc())


@analytics_query("peak_hours")
def peak_hours(dfs, as_of: dt.date) -> DataFrame:
    """Appointments + outcome rates per hour block (ref sql/4:122-132);
    hour block from the TIME-as-string column."""
    a = dfs["appointments"].filter(
        F.col("appointment_date") >= _days_back(as_of, 30)
    )
    s = F.col("status")
    return (
        a.groupBy(
            F.concat(F.substring("appointment_time", 1, 2), F.lit(":00")).alias(
                "hour_block"
            )
        )
        .agg(
            F.count("*").alias("total_appointments"),
            (F.avg(F.when(s == "completed", 1.0).otherwise(0.0)) * 100).alias(
                "completion_rate"
            ),
            (F.avg(F.when(s == "no_show", 1.0).otherwise(0.0)) * 100).alias(
                "no_show_rate"
            ),
        )
        .orderBy("hour_block")
    )


@analytics_query("busiest_days")
def busiest_days(dfs, as_of: dt.date) -> DataFrame:
    """Busiest weekdays, Snowflake DAYNAME/DAYOFWEEK semantics
    (ref sql/4:134-144)."""
    a = dfs["appointments"].filter(
        F.col("appointment_date") >= _days_back(as_of, 90)
    )
    return (
        a.groupBy(
            sf_dayname(F.col("appointment_date")).alias("day_of_week"),
            sf_dayofweek(F.col("appointment_date")).alias("day_num"),
        )
        .agg(
            F.count("*").alias("total_appointments"),
            (
                F.avg(F.when(F.col("status") == "completed", 1.0).otherwise(0.0))
                * 100
            ).alias("completion_rate"),
        )
        .orderBy("day_num")
    )


# -- 3. Doctor performance ----------------------------------------------------


@analytics_query("doctor_productivity")
def doctor_productivity(dfs, as_of: dt.date) -> DataFrame:
    """Doctor productivity last 30 days (ref sql/4:150-167)."""
    d = dfs["doctors"].alias("d")
    a = dfs["appointments"].alias("a")
    cond = (
        (F.col("d.doctor_id") == F.col("a.doctor_id"))
        & (F.col("a.appointment_date") >= _days_back(as_of, 30))
        & (F.col("a.appointment_date") <= _as_of_col(as_of))
    )
    s = F.col("a.status")
    return (
        d.join(a, cond, "left")
        .groupBy(
            F.col("d.doctor_id").alias("doctor_id"),
            _full_name("d").alias("doctor_name"),
            F.col("d.specialization").alias("specialization"),
        )
        .agg(
            F.count("a.appointment_id").alias("total_appointments"),
            F.sum(F.when(s == "completed", 1).otherwise(0)).alias("completed"),
            F.sum(F.when(s == "cancelled", 1).otherwise(0)).alias("cancelled"),
            F.sum(F.when(s == "no_show", 1).otherwise(0)).alias("no_shows"),
            F.countDistinct("a.appointment_date").alias("days_worked"),
        )
        .withColumn(
            "completion_rate",
            F.round(
                F.col("completed")
                * 100.0
                / nullif_zero(F.col("total_appointments")),
                1,
            ),
        )
        .orderBy(F.col("completed").desc(), F.col("doctor_id"))
    )


@analytics_query("avg_appointments_per_day")
def avg_appointments_per_day(dfs, as_of: dt.date) -> DataFrame:
    """Completed appointments per working day (ref sql/4:169-188)."""
    d = dfs["doctors"].alias("d")
    a = dfs["appointments"].alias("a")
    cond = (
        (F.col("d.doctor_id") == F.col("a.doctor_id"))
        & (F.col("a.appointment_date") >= _days_back(as_of, 30))
        & (F.col("a.status") == "completed")
    )
    return (
        d.join(a, cond, "left")
        .groupBy(
            F.col("d.doctor_id").alias("doctor_id"),
            _full_name("d").alias("doctor_name"),
            F.col("d.specialization").alias("specialization"),
        )
        .agg(
            F.count("a.appointment_id").alias("total_appointments"),
            F.countDistinct("a.appointment_date").alias("days_with_appointments"),
        )
        .filter(F.col("days_with_appointments") > 0)
        .withColumn(
            "avg_appointments_per_day",
            F.round(
                F.col("total_appointments")
                * 1.0
                / nullif_zero(F.col("days_with_appointments")),
                1,
            ),
        )
        .orderBy(F.col("avg_appointments_per_day").desc(), F.col("doctor_id"))
    )


@analytics_query("followup_rates")
def followup_rates(dfs, as_of: dt.date) -> DataFrame:
    """Follow-up / prescription rates per doctor (ref sql/4:190-207)."""
    d = dfs["doctors"].alias("d")
    v = dfs["visits"].alias("v")
    return (
        d.join(v, F.col("d.doctor_id") == F.col("v.doctor_id"))
        .groupBy(
            F.col("d.doctor_id").alias("doctor_id"),
            _full_name("d").alias("doctor_name"),
            F.col("d.specialization").alias("specialization"),
        )
        .agg(
            F.count("v.visit_id").alias("total_visits"),
            F.sum(F.when(F.col("v.follow_up_required"), 1).otherwise(0)).alias(
                "followups_needed"
            ),
            F.sum(F.when(F.col("v.prescription_given"), 1).otherwise(0)).alias(
                "prescriptions_written"
            ),
        )
        .withColumn(
            "followup_rate",
            F.round(
                F.col("followups_needed") * 100.0 / nullif_zero(F.col("total_visits")),
                1,
            ),
        )
        .withColumn(
            "prescription_rate",
            F.round(
                F.col("prescriptions_written")
                * 100.0
                / nullif_zero(F.col("total_visits")),
                1,
            ),
        )
        .orderBy(F.col("total_visits").desc(), F.col("doctor_id"))
    )


# -- 4. Revenue ---------------------------------------------------------------


@analytics_query("daily_revenue")
def daily_revenue(dfs, as_of: dt.date) -> DataFrame:
    """Daily revenue trend, last 30 days (ref sql/4:212-224). Exact
    decimal sums on total_charge."""
    v = dfs["visits"].filter(F.col("visit_date") >= _days_back(as_of, 30))
    return (
        v.groupBy("visit_date")
        .agg(
            F.count("*").alias("visit_count"),
            F.sum("total_charge").alias("daily_revenue"),
            F.avg("total_charge").alias("avg_revenue_per_visit"),
            F.min("total_charge").alias("min_charge"),
            F.max("total_charge").alias("max_charge"),
        )
        .orderBy(F.col("visit_date").desc())
    )


@analytics_query("revenue_by_department")
def revenue_by_department(dfs, as_of: dt.date) -> DataFrame:
    """Revenue share per department — SUM(SUM()) OVER() nested window
    (ref sql/4:226-238)."""
    d = dfs["doctors"].alias("d")
    v = dfs["visits"].alias("v")
    rev = (
        d.join(v, F.col("d.doctor_id") == F.col("v.doctor_id"))
        .groupBy(F.col("d.department").alias("department"))
        .agg(
            F.count("v.visit_id").alias("visit_count"),
            F.sum("v.total_charge").alias("total_revenue"),
            F.round(F.avg("v.total_charge"), 2).alias("avg_revenue_per_visit"),
        )
    )
    total = F.sum("total_revenue").over(Window.partitionBy())
    return rev.withColumn(
        "revenue_percentage",
        F.round(pct_of(F.col("total_revenue").cast("double"), total.cast("double")), 1),
    ).orderBy(F.col("total_revenue").desc())


@analytics_query("revenue_by_doctor_top10")
def revenue_by_doctor_top10(dfs, as_of: dt.date) -> DataFrame:
    """Top-10 doctors by revenue (ref sql/4:240-254)."""
    d = dfs["doctors"].alias("d")
    v = dfs["visits"].alias("v")
    return (
        d.join(v, F.col("d.doctor_id") == F.col("v.doctor_id"))
        .groupBy(
            F.col("d.doctor_id").alias("doctor_id"),
            _full_name("d").alias("doctor_name"),
            F.col("d.specialization").alias("specialization"),
            F.col("d.department").alias("department"),
        )
        .agg(
            F.count("v.visit_id").alias("total_visits"),
            F.sum("v.total_charge").alias("total_revenue"),
            F.round(F.avg("v.total_charge"), 2).alias("avg_charge_per_visit"),
        )
        .orderBy(F.col("total_revenue").desc(), F.col("doctor_id"))
        .limit(10)
    )


@analytics_query("monthly_revenue")
def monthly_revenue(dfs, as_of: dt.date) -> DataFrame:
    """Monthly revenue summary (ref sql/4:256-266)."""
    v = dfs["visits"]
    return (
        v.groupBy(F.date_format("visit_date", "yyyy-MM").alias("month"))
        .agg(
            F.count("*").alias("total_visits"),
            F.sum("total_charge").alias("monthly_revenue"),
            F.round(F.avg("total_charge"), 2).alias("avg_revenue_per_visit"),
            F.countDistinct("patient_id").alias("unique_patients"),
        )
        .orderBy(F.col("month").desc())
    )


# -- 5. Clinical insights -----------------------------------------------------


@analytics_query("common_diagnoses")
def common_diagnoses(dfs, as_of: dt.date) -> DataFrame:
    """Most common diagnoses with share and cost (ref sql/4:271-281)."""
    v = dfs["visits"]
    counts = v.groupBy("diagnosis").agg(
        F.count("*").alias("frequency"),
        F.round(F.avg("total_charge"), 2).alias("avg_cost"),
        F.sum(F.when(F.col("follow_up_required"), 1).otherwise(0)).alias(
            "followups_needed"
        ),
    )
    total = F.sum("frequency").over(Window.partitionBy())
    return (
        counts.withColumn(
            "percentage", F.round(pct_of(F.col("frequency"), total), 1)
        )
        .orderBy(F.col("frequency").desc(), F.col("diagnosis"))
        .limit(15)
    )


@analytics_query("common_reasons")
def common_reasons(dfs, as_of: dt.date) -> DataFrame:
    """Most common visit reasons, last 60 days (ref sql/4:283-294)."""
    a = dfs["appointments"].filter(
        F.col("appointment_date") >= _days_back(as_of, 60)
    )
    s = F.col("status")
    counts = a.groupBy("reason_for_visit").agg(
        F.count("*").alias("frequency"),
        F.sum(F.when(s == "completed", 1).otherwise(0)).alias("completed"),
        F.sum(F.when(s == "no_show", 1).otherwise(0)).alias("no_shows"),
    )
    total = F.sum("frequency").over(Window.partitionBy())
    return (
        counts.withColumn(
            "percentage_of_appointments",
            F.round(pct_of(F.col("frequency"), total), 1),
        )
        .orderBy(F.col("frequency").desc(), F.col("reason_for_visit"))
        .limit(15)
    )


@analytics_query("appointment_type_by_specialization")
def appointment_type_by_specialization(dfs, as_of: dt.date) -> DataFrame:
    """Type mix within each specialization — partitioned %-of-total
    (ref sql/4:296-307)."""
    a = dfs["appointments"].alias("a")
    d = dfs["doctors"].alias("d")
    counts = (
        a.filter(F.col("a.appointment_date") >= _days_back(as_of, 60))
        .join(F.broadcast(d), F.col("a.doctor_id") == F.col("d.doctor_id"))
        .groupBy(
            F.col("d.specialization").alias("specialization"),
            F.col("a.appointment_type").alias("appointment_type"),
        )
        .agg(F.count("*").alias("count"))
    )
    within = F.sum("count").over(Window.partitionBy("specialization"))
    return counts.withColumn(
        "percentage", F.round(pct_of(F.col("count"), within), 1)
    ).orderBy("specialization", F.col("count").desc())


# -- 6. Patient analytics -----------------------------------------------------


@analytics_query("patient_visit_frequency")
def patient_visit_frequency(dfs, as_of: dt.date) -> DataFrame:
    """Frequent patients (>= 3 visits) with spend (ref sql/4:313-327)."""
    p = dfs["patients"].alias("p")
    v = dfs["visits"].alias("v")
    return (
        p.join(v, F.col("p.patient_id") == F.col("v.patient_id"))
        .groupBy(
            F.col("p.patient_id").alias("patient_id"),
            _full_name("p").alias("patient_name"),
            F.col("p.insurance_provider").alias("insurance_provider"),
        )
        .agg(
            F.count("v.visit_id").alias("total_visits"),
            F.min("v.visit_date").alias("first_visit"),
            F.max("v.visit_date").alias("most_recent_visit"),
            F.sum("v.total_charge").alias("total_spent"),
            F.round(F.avg("v.total_charge"), 2).alias("avg_per_visit"),
        )
        .filter(F.col("total_visits") >= 3)
        .orderBy(
            F.col("total_visits").desc(), F.col("total_spent").desc(), "patient_id"
        )
    )


@analytics_query("new_vs_returning")
def new_vs_returning(dfs, as_of: dt.date) -> DataFrame:
    """New vs returning patients over visits in the last 30 days
    (ref sql/4:329-350) — join against a first-visit-ever CTE."""
    p = dfs["patients"].alias("p")
    v = dfs["visits"].alias("v")
    first_visit = (
        p.join(v, F.col("p.patient_id") == F.col("v.patient_id"), "left")
        .groupBy(F.col("p.patient_id").alias("fp_id"))
        .agg(F.min("v.visit_date").alias("first_visit_ever"))
    )
    recent = dfs["visits"].filter(F.col("visit_date") >= _days_back(as_of, 30))
    patient_type = F.when(
        F.col("first_visit_ever") >= _days_back(as_of, 30), "New Patient"
    ).otherwise("Returning Patient")
    return (
        recent.join(
            F.broadcast(first_visit), recent.patient_id == F.col("fp_id")
        )
        .groupBy(patient_type.alias("patient_type"))
        .agg(
            F.countDistinct("patient_id").alias("patient_count"),
            F.count("visit_id").alias("total_visits"),
            F.sum("total_charge").alias("total_revenue"),
        )
    )


@analytics_query("patient_demographics")
def patient_demographics(dfs, as_of: dt.date) -> DataFrame:
    """Age-group demographics via Snowflake DATEDIFF(year) semantics
    (ref sql/4:352-370)."""
    p = dfs["patients"].alias("p")
    v = dfs["visits"].alias("v")
    age = sf_datediff_year(F.col("p.date_of_birth"), _as_of_col(as_of))
    age_group = (
        F.when(age < 18, "Pediatric (0-17)")
        .when(age.between(18, 30), "Young Adult (18-30)")
        .when(age.between(31, 50), "Adult (31-50)")
        .when(age.between(51, 65), "Middle Age (51-65)")
        .otherwise("Senior (65+)")
    )
    return (
        p.join(v, F.col("p.patient_id") == F.col("v.patient_id"), "left")
        .groupBy(age_group.alias("age_group"))
        .agg(
            F.countDistinct("p.patient_id").alias("patient_count"),
            F.count("v.visit_id").alias("total_visits"),
            F.round(F.avg("v.total_charge"), 2).alias("avg_visit_cost"),
        )
        .orderBy("age_group")
    )


# -- 7. CDC audit trail (raw views: soft-deleted rows included) ---------------


@analytics_query("cdc_recent_changes")
def cdc_recent_changes(dfs, as_of: dt.date) -> DataFrame:
    """Recently modified appointments via _SNOWFLAKE_UPDATED_AT
    (ref sql/4:375-390). Expects the RAW replica (includes deleted)."""
    a = dfs["appointments_raw"]
    as_of_ts = F.lit(f"{as_of.isoformat()} 23:59:59").cast("timestamp_ntz")
    return (
        a.filter(
            F.col(schemas.META_UPDATED_AT).isNotNull()
            & (
                F.col(schemas.META_UPDATED_AT)
                >= as_of_ts - F.expr("INTERVAL 24 HOURS")
            )
        )
        .select(
            "appointment_id",
            "patient_id",
            "doctor_id",
            "appointment_date",
            "appointment_time",
            "status",
            "reason_for_visit",
            schemas.META_INSERTED_AT,
            schemas.META_UPDATED_AT,
            schemas.META_DELETED,
        )
        .orderBy(F.col(schemas.META_UPDATED_AT).desc(), "appointment_id")
        .limit(50)
    )


@analytics_query("cdc_change_volume")
def cdc_change_volume(dfs, as_of: dt.date) -> DataFrame:
    """Insert/update/delete volume last 24h per table (ref sql/4:392-417)."""
    as_of_ts = F.lit(f"{as_of.isoformat()} 23:59:59").cast("timestamp_ntz")
    cutoff = as_of_ts - F.expr("INTERVAL 24 HOURS")

    def volume(df: DataFrame, name: str) -> DataFrame:
        upd = F.col(schemas.META_UPDATED_AT)
        return df.filter(
            (F.col(schemas.META_INSERTED_AT) >= cutoff) | (upd >= cutoff)
        ).agg(
            F.lit(name).alias("table_name"),
            F.count("*").alias("total_records"),
            F.sum(F.when(upd.isNull(), 1).otherwise(0)).alias("insert_only"),
            F.sum(F.when(upd.isNotNull(), 1).otherwise(0)).alias("updated"),
            F.sum(F.when(F.col(schemas.META_DELETED), 1).otherwise(0)).alias(
                "deleted"
            ),
        )

    return volume(dfs["appointments_raw"], "appointments").unionByName(
        volume(dfs["visits_raw"], "visits")
    )


@analytics_query("cdc_update_frequency")
def cdc_update_frequency(dfs, as_of: dt.date) -> DataFrame:
    """Hourly histogram of CDC updates (ref sql/4:419-430)."""
    a = dfs["appointments_raw"]
    as_of_ts = F.lit(f"{as_of.isoformat()} 23:59:59").cast("timestamp_ntz")
    upd = F.col(schemas.META_UPDATED_AT)
    return (
        a.filter(upd.isNotNull() & (upd >= as_of_ts - F.expr("INTERVAL 7 DAYS")))
        .groupBy(
            F.date_trunc("hour", upd).cast("timestamp_ntz").alias("hour_block")
        )
        .agg(
            F.count("*").alias("updates"),
            F.countDistinct("appointment_id").alias("unique_appointments_updated"),
        )
        .orderBy(F.col("hour_block").desc())
    )


# -- 8. Executive KPIs --------------------------------------------------------


@analytics_query("executive_summary")
def executive_summary(dfs, as_of: dt.date) -> DataFrame:
    """One-row KPI rollup over the last 30 days (ref sql/4:435-454)."""
    a = dfs["appointments"].alias("a")
    v = dfs["visits"].alias("v")
    joined = a.filter(
        (F.col("a.appointment_date") >= _days_back(as_of, 30))
        & (F.col("a.appointment_date") <= _as_of_col(as_of))
    ).join(v, F.col("a.appointment_id") == F.col("v.appointment_id"), "left")
    s = F.col("a.status")
    return joined.agg(
        F.countDistinct("a.patient_id").alias("unique_patients_served"),
        F.countDistinct("a.appointment_id").alias("total_appointments"),
        F.sum(F.when(s == "completed", 1).otherwise(0)).alias(
            "completed_appointments"
        ),
        F.round(
            F.sum(F.when(s == "completed", 1).otherwise(0))
            * 100.0
            / nullif_zero(F.count("a.appointment_id")),
            1,
        ).alias("completion_rate"),
        F.sum(F.when(s == "no_show", 1).otherwise(0)).alias("no_shows"),
        F.round(
            F.sum(F.when(s == "no_show", 1).otherwise(0))
            * 100.0
            / nullif_zero(F.count("a.appointment_id")),
            1,
        ).alias("no_show_rate"),
        F.countDistinct("v.visit_id").alias("total_visits"),
        F.sum("v.total_charge").alias("total_revenue"),
        F.round(F.avg("v.total_charge"), 2).alias("avg_revenue_per_visit"),
        F.countDistinct("v.doctor_id").alias("active_doctors"),
    )
