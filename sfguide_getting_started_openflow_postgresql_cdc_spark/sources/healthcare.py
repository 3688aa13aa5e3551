"""Deterministic healthcare fixture generator.

Synthesizes the reference's source dataset shape — 100 patients, 10
doctors, 170 appointments (status distribution: completed 100 / cancelled
40 / scheduled 15 / no_show 10 / confirmed 5), 100 visits derived from
completed appointments — plus the scripted "busy clinic morning" CDC
scenario as ordered change-event batches.

Volumes and semantics follow /root/reference/sql/0.init_healthcare.sql
(:118-345 seed, :43-103 DDL) and sql/3.live_appointments.sql (:29-432
scenario); the row *contents* are our own synthesis (seeded RNG +
generic catalogs), not a copy of the reference's literals.

Everything is seeded (default 42) so golden-count tests are exact.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random
from decimal import Decimal
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from sfguide_getting_started_openflow_postgresql_cdc_spark import schemas

# Deterministic "today" for the scenario (reference scripts are relative
# to CURRENT_DATE; we pin as-of per SURVEY.md §4 "Deterministic now").
AS_OF = dt.date(2024, 6, 3)  # a Monday

_FIRST = ["Ava", "Ben", "Cara", "Dev", "Elle", "Finn", "Gia", "Hugo", "Iris", "Jon",
          "Kira", "Liam", "Mona", "Nico", "Omar", "Pia", "Quinn", "Rosa", "Sam", "Tara"]
_LAST = ["Adams", "Baker", "Chen", "Diaz", "Evans", "Flores", "Garcia", "Hawkins",
         "Ito", "Jones", "Kim", "Lopez", "Moore", "Nguyen", "Ortiz", "Patel",
         "Reyes", "Silva", "Tran", "Walker"]
_CITIES = [("Austin", "TX"), ("Dallas", "TX"), ("Houston", "TX"), ("Miami", "FL"),
           ("Denver", "CO"), ("Seattle", "WA"), ("Boston", "MA"), ("Chicago", "IL")]
_INSURERS = ["Medicare", "Medicaid", "BlueCross", "Aetna", "Cigna", "United",
             "Humana", "Kaiser", "Anthem", "Oscar"]
_SPECS = ["General Practice", "General Practice", "General Practice", "Cardiology",
          "Cardiology", "Pediatrics", "Pediatrics", "Orthopedics", "Dermatology",
          "Internal Medicine"]
_DEPTS = {"General Practice": "Primary Care", "Cardiology": "Cardiovascular",
          "Pediatrics": "Children Services", "Orthopedics": "Surgical Services",
          "Dermatology": "Specialty Care", "Internal Medicine": "Primary Care"}
_REASONS = ["Annual physical", "Flu symptoms", "Back pain", "Headache", "Follow-up",
            "Skin rash", "Chest pain", "Allergies", "Blood pressure check",
            "Joint pain", "Fatigue", "Vaccination", "Lab review", "Cough", "Checkup"]
_DIAGNOSES = ["Hypertension", "Type 2 diabetes", "Influenza", "Migraine",
              "Lower back strain", "Dermatitis", "Asthma", "Anxiety", "Arthritis",
              "Sinusitis", "Bronchitis", "Healthy", "Allergic rhinitis",
              "GERD", "Hyperlipidemia", "Otitis media", "UTI", "Tendonitis",
              "Insomnia", "Obesity", "Anemia"]
_TREATMENTS = ["Rest and fluids", "Prescribed medication", "Physical therapy referral",
               "Lifestyle counseling", "Follow-up in 2 weeks", "Specialist referral",
               "Imaging ordered", "Lab work ordered", "Vaccination administered",
               "No treatment needed"]


def _time_str(h: int, m: int) -> str:
    return f"{h:02d}:{m:02d}:00"


def generate_snapshot(seed: int = 42) -> dict[str, list[dict[str, Any]]]:
    """Build the four source tables as plain row dicts (driver-side: 380
    rows total — this is seed data, not a scale concern)."""
    rng = random.Random(seed)
    base_ts = dt.datetime.combine(AS_OF - dt.timedelta(days=1), dt.time(12, 0, 0))

    doctors = []
    for i in range(1, 11):
        spec = _SPECS[i - 1]
        doctors.append(
            {
                "doctor_id": i,
                "first_name": _FIRST[rng.randrange(20)],
                "last_name": _LAST[rng.randrange(20)],
                "specialization": spec,
                "department": _DEPTS[spec],
                "phone": f"555-2{i:03d}",
                "email": f"doc{i}@clinic.example",
                "years_of_experience": rng.randint(7, 25),
                "accepting_new_patients": True,
            }
        )

    patients = []
    for i in range(1, 101):
        # mix: adults, pediatric, seniors (FIXTURES.md §A)
        bucket = rng.random()
        if bucket < 0.70:
            dob_year = rng.randint(1965, 1999)
        elif bucket < 0.85:
            dob_year = rng.randint(2008, 2016)
        else:
            dob_year = rng.randint(1942, 1951)
        city, state = _CITIES[rng.randrange(len(_CITIES))]
        patients.append(
            {
                "patient_id": i,
                "first_name": _FIRST[rng.randrange(20)],
                "last_name": _LAST[rng.randrange(20)],
                "date_of_birth": dt.date(dob_year, rng.randint(1, 12), rng.randint(1, 28)),
                "phone": f"555-1{i:03d}",
                "email": f"patient{i}@mail.example",
                "address": f"{100 + i} Main St",
                "city": city,
                "state": state,
                "insurance_provider": _INSURERS[rng.randrange(10)],
                "registration_date": dt.datetime(
                    rng.randint(2022, 2024), rng.randint(1, 10), rng.randint(1, 28),
                    rng.randint(8, 17), 0, 0
                ),
            }
        )

    # 170 appointments: 150 past with the golden status distribution
    # completed 100 / cancelled 40 / no_show 10, then 20 upcoming
    # scheduled 15 / confirmed 5 (sql/2.verify_snapshot.sql:132-137).
    past_statuses = ["completed"] * 100 + ["cancelled"] * 40 + ["no_show"] * 10
    rng.shuffle(past_statuses)
    appointments = []
    for i in range(1, 151):
        day = AS_OF - dt.timedelta(days=rng.randint(1, 90))
        appointments.append(
            {
                "appointment_id": i,
                "patient_id": rng.randint(1, 100),
                "doctor_id": rng.randint(1, 10),
                "appointment_date": day,
                "appointment_time": _time_str(rng.randint(8, 16), rng.choice([0, 15, 30, 45])),
                "status": past_statuses[i - 1],
                "reason_for_visit": _REASONS[rng.randrange(15)],
                "appointment_type": rng.choices(
                    ["routine", "urgent", "follow_up", "annual"],
                    weights=[60, 15, 15, 10],
                )[0],
                "created_at": base_ts - dt.timedelta(days=rng.randint(91, 120)),
                "updated_at": base_ts - dt.timedelta(days=rng.randint(0, 90)),
            }
        )
    for i in range(151, 171):
        day = AS_OF + dt.timedelta(days=rng.randint(0, 30))
        appointments.append(
            {
                "appointment_id": i,
                "patient_id": rng.randint(1, 100),
                "doctor_id": rng.randint(1, 10),
                "appointment_date": day,
                "appointment_time": _time_str(rng.randint(8, 16), rng.choice([0, 15, 30, 45])),
                "status": "scheduled" if i <= 165 else "confirmed",
                "reason_for_visit": _REASONS[rng.randrange(15)],
                "appointment_type": rng.choices(
                    ["routine", "urgent", "follow_up", "annual"],
                    weights=[60, 15, 15, 10],
                )[0],
                "created_at": base_ts,
                "updated_at": base_ts,
            }
        )

    # 100 visits — one per completed appointment, first 100 by id
    # (sql/0.init_healthcare.sql:343-345).
    completed = [a for a in appointments if a["status"] == "completed"][:100]
    visits = []
    for vid, appt in enumerate(completed, start=1):
        start = dt.datetime.combine(
            appt["appointment_date"],
            dt.time(int(appt["appointment_time"][:2]), int(appt["appointment_time"][3:5])),
        )
        visits.append(
            {
                "visit_id": vid,
                "appointment_id": appt["appointment_id"],
                "patient_id": appt["patient_id"],
                "doctor_id": appt["doctor_id"],
                "visit_date": appt["appointment_date"],
                "visit_start_time": start,
                "visit_end_time": start + dt.timedelta(minutes=30),
                "diagnosis": _DIAGNOSES[rng.randrange(21)],
                "treatment_notes": _TREATMENTS[rng.randrange(10)],
                "follow_up_required": rng.random() < 0.30,
                "prescription_given": rng.random() < 0.40,
                "total_charge": Decimal(f"{rng.uniform(75.0, 350.0):.2f}"),
            }
        )

    return {
        "patients": patients,
        "doctors": doctors,
        "appointments": appointments,
        "visits": visits,
    }


def snapshot_dataframes(spark: SparkSession, seed: int = 42) -> dict[str, DataFrame]:
    rows = generate_snapshot(seed)
    out = {}
    for name, recs in rows.items():
        schema = schemas.HEALTHCARE_TABLES[name]
        ordered = [[r[f.name] for f in schema.fields] for r in recs]
        out[name] = spark.createDataFrame(ordered, schema)
    return out


# --------------------------------------------------------------------------
# Scripted CDC scenario (sql/3.live_appointments.sql re-expressed as
# ordered event batches; FIXTURES.md §B).
# --------------------------------------------------------------------------


@dataclass
class Event:
    seq_no: int
    event_ts: dt.datetime
    table_name: str
    op: str  # I | U | D
    after: dict[str, Any] = field(default_factory=dict)


def _appt(appt_id, patient, doctor, date, time, status, reason, atype, ts):
    return {
        "appointment_id": appt_id, "patient_id": patient, "doctor_id": doctor,
        "appointment_date": date, "appointment_time": time, "status": status,
        "reason_for_visit": reason, "appointment_type": atype,
        "created_at": ts, "updated_at": ts,
    }


def generate_scenario(
    snapshot: dict[str, list[dict[str, Any]]], seed: int = 42
) -> list[list[Event]]:
    """The 'busy clinic morning': ordered batches, one per sync interval
    (the reference waits ~60 s between mutation groups). UPDATE events
    carry the full post-image (logical-replication REPLICA IDENTITY FULL
    analog); DELETE events carry the PK only.
    """
    rng = random.Random(seed + 1)
    appts = {a["appointment_id"]: dict(a) for a in snapshot["appointments"]}
    doctors = {d["doctor_id"]: dict(d) for d in snapshot["doctors"]}
    t0 = dt.datetime.combine(AS_OF, dt.time(8, 0, 0))
    seq = 0
    batches: list[list[Event]] = []

    def tick(batch_idx: int, step: int) -> dt.datetime:
        return t0 + dt.timedelta(minutes=batch_idx, seconds=step)

    def emit(batch: list[Event], table: str, op: str, after: dict, bi: int):
        nonlocal seq
        seq += 1
        batch.append(Event(seq, tick(bi, len(batch)), table, op, after))

    def upd_appt(batch, appt_id, bi, **changes):
        row = appts[appt_id]
        row.update(changes)
        row["updated_at"] = tick(bi, len(batch))
        emit(batch, "appointments", "U", dict(row), bi)

    next_appt = 171
    next_visit = 101

    # b0: 3 walk-in inserts (ref :39-42)
    b = []
    for _ in range(3):
        row = _appt(next_appt, rng.randint(1, 100), rng.randint(1, 10), AS_OF,
                    _time_str(9 + len(b), 0), "scheduled",
                    _REASONS[rng.randrange(15)], "routine", tick(0, len(b)))
        appts[next_appt] = row
        emit(b, "appointments", "I", dict(row), 0)
        next_appt += 1
    batches.append(b)

    # b1: morning status wave on TODAY's appointments — 2 confirms,
    # 2 check-ins, 1 start (ref :56-107; patients physically in clinic
    # are necessarily same-day)
    b = []
    today = lambda a: a["appointment_date"] == AS_OF  # noqa: E731
    scheduled = sorted(
        k for k, a in appts.items() if a["status"] == "scheduled" and today(a)
    )
    for k in scheduled[:2]:
        upd_appt(b, k, 1, status="confirmed")
    confirmed = sorted(
        k for k, a in appts.items() if a["status"] == "confirmed" and today(a)
    )
    for k in confirmed[:2]:
        upd_appt(b, k, 1, status="checked_in")
    checked = sorted(
        k for k, a in appts.items() if a["status"] == "checked_in" and today(a)
    )
    upd_appt(b, checked[0], 1, status="in_progress")
    batches.append(b)

    # b2: 2 completions + 2 visit inserts (ref :122-149 UPDATE..RETURNING->INSERT)
    b = []
    in_prog = sorted(k for k, a in appts.items() if a["status"] == "in_progress")
    checked = sorted(k for k, a in appts.items() if a["status"] == "checked_in")
    for k in (in_prog + checked)[:2]:
        upd_appt(b, k, 2, status="completed")
        a = appts[k]
        start = dt.datetime.combine(
            a["appointment_date"],
            dt.time(int(a["appointment_time"][:2]), int(a["appointment_time"][3:5])),
        )
        emit(b, "visits", "I", {
            "visit_id": next_visit, "appointment_id": k, "patient_id": a["patient_id"],
            "doctor_id": a["doctor_id"], "visit_date": a["appointment_date"],
            "visit_start_time": start, "visit_end_time": start + dt.timedelta(minutes=30),
            "diagnosis": _DIAGNOSES[rng.randrange(21)],
            "treatment_notes": _TREATMENTS[rng.randrange(10)],
            "follow_up_required": rng.random() < 0.3,
            "prescription_given": rng.random() < 0.4,
            "total_charge": round(rng.uniform(75.0, 350.0), 2),
        }, 2)
        next_visit += 1
    batches.append(b)

    # b3: 2 urgent same-day inserts (ref :163-165)
    b = []
    for _ in range(2):
        row = _appt(next_appt, rng.randint(1, 100), rng.randint(1, 10), AS_OF,
                    _time_str(11, 30), "scheduled",
                    "Chest pain", "urgent", tick(3, len(b)))
        appts[next_appt] = row
        emit(b, "appointments", "I", dict(row), 3)
        next_appt += 1
    batches.append(b)

    # b4: 1 cancellation (ref :178-188)
    b = []
    scheduled = sorted(k for k, a in appts.items()
                       if a["status"] == "scheduled" and k > 150)
    upd_appt(b, scheduled[0], 4, status="cancelled")
    batches.append(b)

    # b5: more check-ins / starts (ref :202-230)
    b = []
    scheduled = sorted(k for k, a in appts.items()
                       if a["status"] == "scheduled" and k >= 171)
    for k in scheduled[:2]:
        upd_appt(b, k, 5, status="checked_in")
    checked = sorted(k for k, a in appts.items() if a["status"] == "checked_in")
    upd_appt(b, checked[0], 5, status="in_progress")
    batches.append(b)

    # b6: 2 more completions + visits (ref :244-269)
    b = []
    in_prog = sorted(k for k, a in appts.items() if a["status"] == "in_progress")
    checked = sorted(k for k, a in appts.items() if a["status"] == "checked_in")
    for k in (in_prog + checked)[:2]:
        upd_appt(b, k, 6, status="completed")
        a = appts[k]
        start = dt.datetime.combine(
            a["appointment_date"],
            dt.time(int(a["appointment_time"][:2]), int(a["appointment_time"][3:5])),
        )
        emit(b, "visits", "I", {
            "visit_id": next_visit, "appointment_id": k, "patient_id": a["patient_id"],
            "doctor_id": a["doctor_id"], "visit_date": a["appointment_date"],
            "visit_start_time": start, "visit_end_time": start + dt.timedelta(minutes=30),
            "diagnosis": _DIAGNOSES[rng.randrange(21)],
            "treatment_notes": _TREATMENTS[rng.randrange(10)],
            "follow_up_required": rng.random() < 0.3,
            "prescription_given": rng.random() < 0.4,
            "total_charge": round(rng.uniform(75.0, 350.0), 2),
        }, 6)
        next_visit += 1
    batches.append(b)

    # b7: 5 future-day inserts (ref :282-287)
    b = []
    for j in range(5):
        row = _appt(next_appt, rng.randint(1, 100), rng.randint(1, 10),
                    AS_OF + dt.timedelta(days=1 + j), _time_str(10, 0), "scheduled",
                    _REASONS[rng.randrange(15)], "routine", tick(7, len(b)))
        appts[next_appt] = row
        emit(b, "appointments", "I", dict(row), 7)
        next_appt += 1
    batches.append(b)

    # b8: 1 no-show (ref :300-310)
    b = []
    scheduled = sorted(k for k, a in appts.items()
                       if a["status"] == "scheduled" and k <= 170)
    upd_appt(b, scheduled[0], 8, status="no_show")
    batches.append(b)

    # b9: retention cleanup — DELETE 2 oldest cancelled (ref :324-334),
    # PK-only payload; replica soft-deletes.
    b = []
    cancelled = sorted(
        (k for k, a in appts.items() if a["status"] == "cancelled"),
        key=lambda k: (appts[k]["appointment_date"], k),
    )
    for k in cancelled[:2]:
        emit(b, "appointments", "D", {"appointment_id": k}, 9)
    batches.append(b)

    # b10: doctor 9 stops accepting new patients (ref :349-351)
    b = []
    drow = doctors[9]
    drow["accepting_new_patients"] = False
    emit(b, "doctors", "U", dict(drow), 10)
    batches.append(b)

    return batches


def _json_default(v):
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, dt.datetime) else v.isoformat()
    raise TypeError(str(type(v)))


def write_scenario_jsonl(batches: list[list[Event]], out_dir: str) -> list[str]:
    """One JSON-lines file per sync batch — the streaming source replays
    them in order (file-per-micro-batch with maxFilesPerTrigger=1)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, batch in enumerate(batches):
        path = os.path.join(out_dir, f"events_{i:04d}.jsonl")
        with open(path, "w") as f:
            for ev in batch:
                f.write(
                    json.dumps(
                        {
                            "seq_no": ev.seq_no,
                            "event_ts": ev.event_ts.isoformat(sep=" "),
                            "table_name": ev.table_name,
                            "op": ev.op,
                            "after": {
                                k: (None if v is None else _json_default(v)
                                    if isinstance(v, (dt.date, dt.datetime))
                                    else v)
                                for k, v in ev.after.items()
                            },
                        }
                    )
                    + "\n"
                )
        paths.append(path)
    return paths
