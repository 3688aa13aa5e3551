"""Semantic-layer tests (SURVEY.md §2.J): catalog validation, relationship
join builder, verified queries, serialization round-trip."""

import pytest
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark import schemas
from sfguide_getting_started_openflow_postgresql_cdc_spark.semantic import (
    SemanticModel,
    healthcare_model,
)
from sfguide_getting_started_openflow_postgresql_cdc_spark.sources import healthcare
from sfguide_getting_started_openflow_postgresql_cdc_spark.streaming.cdc import (
    CdcEngine,
    ReplicaStore,
)

LOAD_TS = "2024-06-02 12:00:00"


@pytest.fixture(scope="module")
def replicas(spark, tmp_path_factory):
    engine = CdcEngine(
        ReplicaStore(str(tmp_path_factory.mktemp("wh_sem"))), write_partitions=1
    )
    engine.bootstrap(spark, healthcare.snapshot_dataframes(spark), LOAD_TS)
    return {t: engine.store.read(spark, t) for t in schemas.HEALTHCARE_TABLES}


@pytest.fixture(scope="module")
def model():
    return healthcare_model()


def test_model_validates_against_replicas(model, replicas):
    assert model.validate(replicas) == []


def test_model_detects_missing_column(model, replicas):
    broken = dict(replicas)
    broken["visits"] = replicas["visits"].drop("total_charge")
    problems = model.validate(broken)
    assert "missing column visits.total_charge" in problems


def test_relationship_join_builder(model, replicas):
    joined = model.join(replicas, "appointments", "doctors")
    assert joined.count() == 170  # every appointment has a doctor
    left = model.join(replicas, "visits", "patients", how="left")
    assert left.count() == 100


def test_verified_total_appointments(spark, model, replicas):
    out = model.run_verified("total_appointments", spark, replicas).collect()
    assert out[0]["total_appointments"] == 170


def test_verified_revenue_by_doctor(spark, model, replicas):
    rows = model.run_verified("revenue_by_doctor", spark, replicas).collect()
    assert len(rows) == 10  # left join keeps doctors with zero visits
    assert rows[0]["total_revenue"] >= rows[-1]["total_revenue"] or (
        rows[-1]["total_revenue"] is None
    )
    total = sum(float(r["total_revenue"]) for r in rows if r["total_revenue"] is not None)
    expected = float(
        replicas["visits"].agg(F.sum("total_charge")).collect()[0][0]
    )
    assert abs(total - expected) < 0.01


def test_verified_modified_today_with_as_of(spark, model, replicas):
    dfs = dict(replicas)
    dfs["_as_of_date"] = "2024-06-03"
    out = model.run_verified("appointments_modified_today", spark, dfs).collect()
    assert out[0]["appointments_modified_today"] == 0  # snapshot only


def test_serialization_round_trip(model, tmp_path):
    path = str(tmp_path / "model.json")
    model.save(path)
    import json

    loaded = SemanticModel.load_dict(json.load(open(path)))
    assert set(loaded.tables) == set(model.tables)
    assert set(loaded.relationships) == set(model.relationships)
    assert loaded.tables["visits"].column("total_charge").kind == "fact"
    d = model.to_dict()
    assert {q["name"] for q in d["verified_queries"]} == {
        "total_appointments",
        "appointments_modified_today",
        "revenue_by_doctor",
    }


REFERENCE_YAML = "/root/reference/semantic-models/healthcare_cdc_semantic_model.yaml"


def test_loads_actual_reference_yaml(model, replicas):
    """The interop claim: parse the reference's own semantic-model
    artifact and get a model STRUCTURALLY IDENTICAL to the hand-declared
    healthcare_model() — same tables, pks, column name+kind sets, and
    (orientation-normalized) relationships — that also validates against
    real replicas."""
    import os

    from sfguide_getting_started_openflow_postgresql_cdc_spark.semantic.model import (
        load_reference_yaml,
    )

    if not os.path.exists(REFERENCE_YAML):
        pytest.skip("reference yaml not present in this environment")
    ref = load_reference_yaml(REFERENCE_YAML)

    assert set(ref.tables) == set(model.tables)
    for name, t in ref.tables.items():
        ours = model.tables[name]
        assert t.primary_key == ours.primary_key
        assert {(c.name, c.kind) for c in t.columns} == {
            (c.name, c.kind) for c in ours.columns
        }, name
    norm = lambda m: {
        (r.name, r.left_table, r.right_table, r.left_key, r.right_key)
        for r in m.relationships.values()
    }
    assert norm(ref) == norm(model)

    # the parsed model drives the same machinery as the coded one
    assert ref.validate(replicas) == []
    joined = ref.join(replicas, "appointments", "doctors")
    assert "specialization" in joined.columns

    # verified queries come through verbatim, soft-delete filter intact
    assert len(ref.reference_verified_sql) == 3
    assert all(
        "_snowflake_deleted = FALSE" in sql or "_SNOWFLAKE_DELETED = FALSE" in sql
        for sql in ref.reference_verified_sql.values()
    )


def test_nl_routing_reaches_verified_queries(spark, model, replicas):
    """The deterministic NL router (SURVEY §2.J3): paraphrases — via
    table/column synonym expansion — land on the right verified query;
    off-domain questions are refused, never guessed."""
    cases = {
        "How many appointments do we have in total?": "total_appointments",
        "count of all the bookings": "total_appointments",
        "What is the total revenue by doctor?": "revenue_by_doctor",
        "billed amount per physician": "revenue_by_doctor",
        "How many appointments were modified via CDC today?":
            "appointments_modified_today",
    }
    for question, want in cases.items():
        assert model.route_question(question) == want, question

    with pytest.raises(KeyError, match="no verified query"):
        model.route_question("what is the weather on jupiter")

    dfs = dict(replicas)
    dfs["_as_of_date"] = "2024-06-02"
    out = model.ask("how many bookings total?", spark, dfs)
    assert out.collect()[0]["total_appointments"] > 0


def test_template_routing_three_families(spark, model, replicas):
    """Parameterized NL templates (SURVEY §2.J3 breadth): grouped-measure,
    grouped-count, and table-count questions resolve through the model's
    column/table synonyms into deterministic DataFrame plans — no LLM,
    same refusal discipline as the verified router."""
    # family 1: <measure> by <dimension>, tables joined via relationship
    kind, t = model.route("total revenue by specialization")
    assert kind == "template" and t.family == "measure_by_dimension"
    assert (t.measure_table, t.measure) == ("visits", "total_charge")
    assert (t.dimension_table, t.dimension) == ("doctors", "specialization")
    out = model.run_template(t, spark, replicas).collect()
    want = {
        r["specialization"]: float(r["total"])
        for r in replicas["visits"]
        .join(
            replicas["doctors"], "doctor_id"
        )
        .groupBy("specialization")
        .agg(F.sum("total_charge").alias("total"))
        .collect()
    }
    got = {r["specialization"]: float(r["total_total_charge"]) for r in out}
    assert got == want
    # synonym resolution: 'billed amount per specialty' -> same route
    kind2, t2 = model.route("billed amount per specialty")
    assert (kind2, t2) == (kind, t)

    # family 2: count by dimension (single table)
    kind, t = model.route("how many appointments per status")
    assert kind == "template" and t.family == "count_by_dimension"
    assert (t.dimension_table, t.dimension) == ("appointments", "status")
    got = {r["status"]: r["n"] for r in model.run_template(t, spark, replicas).collect()}
    assert sum(got.values()) == 170 and got["completed"] == 100

    # family 3: bare table count (patients — NOT in any verified query)
    kind, t = model.route("how many patients")
    assert kind == "template" and t.family == "count_table"
    assert t.tables == ("patients",)
    assert model.run_template(t, spark, replicas).collect()[0]["total_patients"] == 100


def test_template_routing_preserves_verified_and_refusal(spark, model, replicas):
    """The blessed catalog still wins when the question matches it (the
    'by doctor' questions group by an entity, not a resolvable dim
    column), qualified count questions are NOT flattened into bare
    counts, and off-domain questions still refuse."""
    assert model.route("What is the total revenue by doctor?") == (
        "verified",
        "revenue_by_doctor",
    )
    # ADVICE r5: a (near-)verbatim blessed question routes VERIFIED even
    # though a count_table template could also parse it — explain_route
    # must audit the catalog entry, not a coincidental template
    assert model.route("How many appointments do we have in total?") == (
        "verified",
        "total_appointments",
    )
    assert (
        model.explain_route("How many appointments do we have in total?")["kind"]
        == "verified"
    )
    assert model.route("billed amount per physician") == (
        "verified",
        "revenue_by_doctor",
    )
    # qualified count: leftover tokens (modified/cdc/today) block the
    # count_table template; the verified query keeps the qualifier
    assert model.route("How many appointments were modified via CDC today?") == (
        "verified",
        "appointments_modified_today",
    )
    with pytest.raises(KeyError):
        model.route("what is the weather on jupiter")
    with pytest.raises(KeyError):
        model.route_template("average nonsense by moon phase")


def test_template_resolution_edges(model):
    """Resolver determinism and refusal edges: longest-synonym match
    wins, ambiguous/unknown tables refuse, qualified counts refuse."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.semantic.model import (
        _toks,
    )

    # longest token-set match wins: "billed amount" (2 tokens) beats any
    # 1-token candidate inside the same text
    assert model._resolve_column(
        _toks("total billed amount"), kinds={"fact"}
    ) == ("visits", "total_charge")
    # synonym and plural folding reach the same column
    assert model._resolve_column(_toks("revenues"), kinds={"fact"}) == (
        "visits",
        "total_charge",
    )
    # no fact resolves from dimension-ish text
    assert model._resolve_column(_toks("city state"), kinds={"fact"}) is None

    # two tables mentioned -> count_table refuses (ambiguous target)
    with pytest.raises(KeyError):
        model.route_template("how many patients and doctors")
    # count with an unexplained qualifier refuses (would drop semantics)
    with pytest.raises(KeyError):
        model.route_template("how many appointments next week")
    # 'by' clause naming a non-column refuses rather than guessing
    with pytest.raises(KeyError):
        model.route_template("revenue by horoscope sign")
    # dimension alone (no measure, no count-word) on the left still
    # routes as a count-by-dimension only when the left side is empty
    kind = model.route_template("by status")
    assert kind.family == "count_by_dimension"


def test_explain_route_is_auditable_and_side_effect_free(model):
    """explain_route reports the decision an agent host would log —
    kind, target, grant surface — without executing anything, and turns
    refusals into structured records instead of exceptions."""
    v = model.explain_route("What is the total revenue by doctor?")
    assert v["kind"] == "verified" and v["name"] == "revenue_by_doctor"
    assert set(v["tables"]) == {"doctors", "visits"}

    t = model.explain_route("total revenue by specialization")
    assert t["kind"] == "template" and t["family"] == "measure_by_dimension"
    assert t["measure"] == "visits.total_charge"
    assert t["dimension"] == "doctors.specialization"
    assert set(t["tables"]) == {"visits", "doctors"}

    r = model.explain_route("what is the weather on jupiter")
    assert r["kind"] == "refused" and r["tables"] == []
    assert "weather" in r["reason"]


def test_template_routing_avg_and_topn_families(spark, model, replicas):
    """r6 families: 'average <measure> by <dimension>' flips SUM to AVG;
    'top N <dimension> by <measure>' resolves the inverse grammar (the
    by-clause names the measure) into an ordered, limited group-by."""
    kind, t = model.route("average revenue by specialization")
    assert kind == "template" and t.family == "avg_measure_by_dimension"
    assert (t.measure_table, t.measure) == ("visits", "total_charge")
    out = {r["specialization"]: r["avg_total_charge"]
           for r in model.run_template(t, spark, replicas).collect()}
    want = {r["specialization"]: r["a"]
            for r in replicas["visits"].join(replicas["doctors"], "doctor_id")
            .groupBy("specialization")
            .agg(F.avg("total_charge").alias("a")).collect()}
    assert out == want

    kind, t = model.route("top 3 specializations by revenue")
    assert kind == "template" and t.family == "top_dimension_by_measure"
    assert t.limit == 3
    rows = model.run_template(t, spark, replicas).collect()
    assert len(rows) == 3
    totals = [float(r["total_total_charge"]) for r in rows]
    assert totals == sorted(totals, reverse=True)
    # auditable: explain_route records the limit
    ex = model.explain_route("top 3 specializations by revenue")
    assert ex["kind"] == "template" and ex["limit"] == 3

    # refusal discipline intact: top-N with an unresolvable measure
    import pytest as _pytest
    with _pytest.raises(KeyError):
        model.route_template("top 3 specializations by moon phase")


def test_template_where_filter_family(spark, model, replicas):
    """r7 family (r6 advice): a question word matching a declared
    CHECK-enum value becomes an equality filter; entity grouping via
    the subject's FK fires only under a qualifier, so the catalog-first
    contract for unqualified questions is preserved; a filter that
    applies to no table the route reads refuses."""
    kind, t = model.route("completed appointments by doctor")
    assert kind == "template" and t.family == "count_by_dimension"
    assert (t.dimension_table, t.dimension) == ("appointments", "doctor_id")
    assert t.filters == (("appointments", "status", "completed"),)
    got = {r["doctor_id"]: r["n"]
           for r in model.run_template(t, spark, replicas).collect()}
    want = {r["doctor_id"]: r["n"]
            for r in replicas["appointments"]
            .filter(F.col("status") == "completed")
            .groupBy("doctor_id").agg(F.count("*").alias("n")).collect()}
    assert got == want and got

    # filter composes with a plain dimension clause too
    kind, t = model.route("how many urgent appointments per status")
    assert kind == "template" and t.family == "count_by_dimension"
    assert t.filters == (("appointments", "appointment_type", "urgent"),)
    rows = model.run_template(t, spark, replicas).collect()
    assert sum(r["n"] for r in rows) == replicas["appointments"].filter(
        (F.col("appointment_type") == "urgent") & (~F.col(schemas.META_DELETED))
    ).count()

    # multi-word enum value ('no show' -> no_show)
    kind, t = model.route("no show appointments by doctor")
    assert t.filters == (("appointments", "status", "no_show"),)

    # count_table with filter: 'how many completed appointments'
    kind, t = model.route("how many completed appointments")
    assert kind == "template" and t.family == "count_table"
    assert t.filters == (("appointments", "status", "completed"),)
    n = model.run_template(t, spark, replicas).collect()[0]["total_appointments"]
    assert n == replicas["appointments"].filter(
        (F.col("status") == "completed") & (~F.col(schemas.META_DELETED))
    ).count()

    # explain_route audits the filter
    ex = model.explain_route("how many completed appointments")
    assert ex["filters"] == ["appointments.status = 'completed'"]

    # refusal: the qualifier's table is not read by the route — the
    # filter must never be silently dropped
    import pytest as _pytest
    with _pytest.raises(KeyError):
        model.route_template("completed patients by city")

    # catalog-first preserved: the UNqualified entity question still
    # routes verified (gate on filters)
    assert model.route("billed amount per physician") == (
        "verified", "revenue_by_doctor",
    )


def test_template_time_bucket_family(spark, model, replicas):
    """r7 family (r6 advice): 'by month|week|...' groups the subject on
    date_trunc of its first-declared time_dimension; works for counts
    and measures, composes with enum filters, stays refusal-disciplined
    for unsupported grains."""
    kind, t = model.route("appointments by month")
    assert kind == "template" and t.family == "count_by_time_bucket"
    assert (t.dimension_table, t.dimension) == ("appointments", "appointment_date")
    assert t.bucket == "month"
    got = {str(r["month"]): r["n"]
           for r in model.run_template(t, spark, replicas).collect()}
    want = {str(r["m"]): r["n"]
            for r in replicas["appointments"]
            .filter(~F.col(schemas.META_DELETED))
            .groupBy(F.trunc("appointment_date", "month").alias("m"))
            .agg(F.count("*").alias("n")).collect()}
    assert got == want and got

    kind, t = model.route("total revenue by month")
    assert kind == "template" and t.family == "measure_by_time_bucket"
    assert (t.measure_table, t.measure) == ("visits", "total_charge")
    assert (t.dimension_table, t.dimension) == ("visits", "visit_date")
    rows = model.run_template(t, spark, replicas).collect()
    assert rows and "total_total_charge" in rows[0].asDict()

    kind, t = model.route("average revenue by week")
    assert t.family == "avg_measure_by_time_bucket" and t.bucket == "week"

    # filter + bucket compose
    kind, t = model.route("completed appointments by month")
    assert t.family == "count_by_time_bucket"
    assert t.filters == (("appointments", "status", "completed"),)
    total = sum(r["n"] for r in model.run_template(t, spark, replicas).collect())
    assert total == replicas["appointments"].filter(
        (F.col("status") == "completed") & (~F.col(schemas.META_DELETED))
    ).count()

    # explain_route audits the bucket
    ex = model.explain_route("appointments by month")
    assert ex["bucket"] == "month"

    # refusals: unknown grain / no time_dimension path
    import pytest as _pytest
    with _pytest.raises(KeyError):
        model.route_template("appointments by fortnight")


def test_template_combined_slots(spark, model, replicas):
    """r8 (VERDICT r7 task 5): slots COMPOSE — WHERE-filter + time
    bucket, filter + joined entity dimension, top-N + FK grouping —
    while refusal discipline, catalog-first precedence for unqualified
    questions, and the explain_route audit surface stay intact."""
    # filter + time bucket
    kind, t = model.route("completed appointments by month")
    assert kind == "template" and t.family == "count_by_time_bucket"
    assert t.filters == (("appointments", "status", "completed"),)
    assert t.bucket == "month"
    got = {str(r["month"]): r["n"]
           for r in model.run_template(t, spark, replicas).collect()}
    want = {str(r["m"]): r["n"]
            for r in replicas["appointments"]
            .filter((F.col("status") == "completed")
                    & (~F.col(schemas.META_DELETED)))
            .groupBy(F.trunc("appointment_date", "month").alias("m"))
            .agg(F.count("*").alias("n")).collect()}
    assert got == want and got

    # filter + JOINED dimension: count subject rows grouped by a
    # dimension on the related entity table
    kind, t = model.route("scheduled appointments by specialty")
    assert kind == "template" and t.family == "count_by_dimension"
    assert t.tables == ("appointments", "doctors")
    assert (t.dimension_table, t.dimension) == ("doctors", "specialization")
    assert t.filters == (("appointments", "status", "scheduled"),)
    got = {r["specialization"]: r["n"]
           for r in model.run_template(t, spark, replicas).collect()}
    a, d = replicas["appointments"].alias("a"), replicas["doctors"].alias("d")
    want = {r["specialization"]: r["n"]
            for r in a.filter((F.col("status") == "scheduled")
                              & (~F.col(f"a.{schemas.META_DELETED}")))
            .join(d.filter(~F.col(f"d.{schemas.META_DELETED}")),
                  F.col("a.doctor_id") == F.col("d.doctor_id"))
            .groupBy(F.col("d.specialization").alias("specialization"))
            .agg(F.count("*").alias("n")).collect()}
    assert got == want and got

    # top-N + FK entity grouping (inverse grammar), no filter needed —
    # LIMIT is inexpressible in the catalog, so the template wins
    kind, t = model.route("top 5 doctors by revenue")
    assert kind == "template" and t.family == "top_dimension_by_measure"
    assert (t.dimension_table, t.dimension) == ("visits", "doctor_id")
    assert t.limit == 5
    rows = model.run_template(t, spark, replicas).collect()
    assert 0 < len(rows) <= 5
    want = (replicas["visits"].filter(~F.col(schemas.META_DELETED))
            .groupBy("doctor_id")
            .agg(F.sum("total_charge").alias("total_total_charge"))
            .orderBy(F.col("total_total_charge").desc_nulls_last(), "doctor_id")
            .limit(5).collect())
    assert [r["doctor_id"] for r in rows] == [r["doctor_id"] for r in want]

    # top-N through the direct-grammar FK branch too
    kind, t = model.route("top 3 revenue by doctor")
    assert kind == "template" and t.limit == 3

    # measure + bucket with a trailing subject qualifier the filter
    # slot consumed ('for completed visits' style) — by-side leftovers
    # must be explained by the subject, else refuse
    kind, t = model.route("average billed amount by month")
    assert kind == "template" and t.family == "avg_measure_by_time_bucket"

    # audit surface carries the combination
    ex = model.explain_route("scheduled appointments by specialty")
    assert ex["kind"] == "template"
    assert ex["filters"] == ["appointments.status = 'scheduled'"]
    assert ex["tables"] == ["appointments", "doctors"]

    # refusal discipline survives the new branches
    import pytest as _pytest
    with _pytest.raises(KeyError):
        model.route_template("top 5 doctors by shoe size")
    with _pytest.raises(KeyError):  # filter table not read by the route
        model.route_template("completed billed amount by week")
    # catalog-first: unqualified entity question still routes verified
    assert model.route("billed amount per physician") == (
        "verified", "revenue_by_doctor",
    )


def test_template_threshold_slot(spark, model, replicas):
    """r9 (VERDICT r8 task 5): a comparator word + literal number
    becomes a HAVING on the aggregated output — including the
    no-by-clause '<entity> with <measure> over N' grammar the r8 router
    refused — composing with the existing families under the same
    precision gate and refusal discipline."""
    # the verdict's canonical refusal: 'doctors with revenue over 1000'
    kind, t = model.route("doctors with revenue over 1900")
    assert kind == "template" and t.family == "measure_by_dimension"
    assert (t.measure_table, t.measure) == ("visits", "total_charge")
    assert (t.dimension_table, t.dimension) == ("visits", "doctor_id")
    assert t.having == (">", 1900.0)
    got = {r["doctor_id"]: r["total_total_charge"]
           for r in model.run_template(t, spark, replicas).collect()}
    want = {r["doctor_id"]: r["s"]
            for r in replicas["visits"]
            .filter(~F.col(schemas.META_DELETED))
            .groupBy("doctor_id").agg(F.sum("total_charge").alias("s"))
            .filter(F.col("s") > 1900).collect()}
    assert got == want and got
    # and it is a PROPER subset: the threshold really cut someone
    all_docs = replicas["visits"].filter(
        ~F.col(schemas.META_DELETED)
    ).select("doctor_id").distinct().count()
    assert 0 < len(got) < all_docs

    # comparator synonyms map to the right operators
    assert model.route_template(
        "doctors with revenue at least 1000"
    ).having == (">=", 1000.0)
    assert model.route_template(
        "doctors with revenue under 500"
    ).having == ("<", 500.0)

    # composes with the by-grammar ('revenue by doctor over 1000' —
    # HAVING unlocks the FK branch exactly like a filter does)
    kind, t2 = model.route("revenue by doctor over 1900")
    assert kind == "template" and t2.having == (">", 1900.0)
    assert {r["doctor_id"] for r in
            model.run_template(t2, spark, replicas).collect()} == set(got)

    # composes with counts and enum filters: doctors with more than N
    # completed appointments
    kind, t3 = model.route("completed appointments by doctor over 10")
    assert kind == "template" and t3.family == "count_by_dimension"
    assert t3.filters == (("appointments", "status", "completed"),)
    assert t3.having == (">", 10.0)
    rows = model.run_template(t3, spark, replicas).collect()
    want3 = (replicas["appointments"]
             .filter((F.col("status") == "completed")
                     & (~F.col(schemas.META_DELETED)))
             .groupBy("doctor_id").agg(F.count("*").alias("n"))
             .filter(F.col("n") > 10).collect())
    assert {(r["doctor_id"], r["n"]) for r in rows} == {
        (r["doctor_id"], r["n"]) for r in want3
    }

    # audit surface carries the slot
    ex = model.explain_route("doctors with revenue over 1000")
    assert ex["kind"] == "template" and ex["having"] == "> 1000.0"

    # refusal discipline: an unbindable threshold must NOT fall through
    # to a similarity-matched catalog answer that would drop it
    import pytest as _pytest
    with _pytest.raises(KeyError, match="threshold/date-range"):
        model.route("doctors with shoe size over 10")
    # malformed numbers never HALF-bind (r9 review: 'over 1,000' must
    # not become having > 1.0 with the ',000' silently dropped; a
    # date-like comparand must not bind its year)
    with _pytest.raises(KeyError, match="threshold/date-range"):
        model.route("doctors with revenue over 1,000")
    with _pytest.raises(KeyError, match="threshold/date-range"):
        model.route("revenue by doctor above 2024-01-01")
    # ...while a sentence-final period still binds cleanly
    assert model.route_template(
        "doctors with revenue over 1900."
    ).having == (">", 1900.0)
    # same-table entity+measure is ambiguous (row filter vs HAVING) —
    # refuse, never guess
    with _pytest.raises(KeyError):
        model.route("doctors with experience over 10")

    # catalog-first precedence intact for unqualified questions
    assert model.route("billed amount per physician") == (
        "verified", "revenue_by_doctor",
    )


def test_template_date_range_slot(spark, model, replicas):
    """r9 (VERDICT r8 task 5): 'between <iso> and <iso>' becomes an
    inclusive WHERE on the anchor table's first-declared time_dimension,
    composing with counts, measures, buckets, filters and thresholds."""
    lo, hi = "2024-05-01", "2024-06-30"
    kind, t = model.route(f"how many appointments between {lo} and {hi}")
    assert kind == "template" and t.family == "count_table"
    assert t.date_range == ("appointments", "appointment_date", lo, hi)
    n = model.run_template(t, spark, replicas).collect()[0]["total_appointments"]
    base = replicas["appointments"].filter(~F.col(schemas.META_DELETED))
    want = base.filter(
        (F.to_date("appointment_date") >= F.lit(lo))
        & (F.to_date("appointment_date") <= F.lit(hi))
    ).count()
    assert n == want
    # non-vacuous: the range cut something and kept something
    assert 0 < n < base.count()

    # measure + FK entity + range ('from X to Y' spelling)
    kind, t2 = model.route(f"revenue by doctor from {lo} to {hi}")
    assert kind == "template" and t2.family == "measure_by_dimension"
    assert t2.date_range == ("visits", "visit_date", lo, hi)
    got = {r["doctor_id"]: r["total_total_charge"]
           for r in model.run_template(t2, spark, replicas).collect()}
    want2 = {r["doctor_id"]: r["s"]
             for r in replicas["visits"]
             .filter(~F.col(schemas.META_DELETED))
             .filter((F.to_date("visit_date") >= F.lit(lo))
                     & (F.to_date("visit_date") <= F.lit(hi)))
             .groupBy("doctor_id").agg(F.sum("total_charge").alias("s"))
             .collect()}
    assert got == want2 and got

    # composes with bucket + enum filter
    kind, t3 = model.route(
        f"completed appointments by month between {lo} and {hi}"
    )
    assert kind == "template" and t3.family == "count_by_time_bucket"
    assert t3.filters == (("appointments", "status", "completed"),)
    assert t3.date_range == ("appointments", "appointment_date", lo, hi)

    # threshold + range compose on one route
    kind, t4 = model.route(
        f"doctors with revenue over 100 between {lo} and {hi}"
    )
    assert t4.having == (">", 100.0)
    assert t4.date_range == ("visits", "visit_date", lo, hi)

    # audit surface
    ex = model.explain_route(f"how many appointments between {lo} and {hi}")
    assert ex["date_range"] == f"appointments.appointment_date between {lo} and {hi}"

    # refusals: anchor table declares no time_dimension; and a range no
    # template can bind never falls through to the catalog
    import pytest as _pytest
    with _pytest.raises(KeyError):
        model.route_template(f"how many doctors between {lo} and {hi}")
    with _pytest.raises(KeyError, match="threshold/date-range"):
        model.route(f"insurance blended rate between {lo} and {hi}")


def test_template_two_measure_family(spark, model, replicas):
    """r9 (closes the last r8 'What's missing' refusal): a two-measure
    entity ask aggregates each measure in ITS OWN table and full-outer
    joins the per-entity aggregates on the entity key; ambiguous
    qualifiers (avg words, thresholds, date ranges over two measures)
    refuse rather than guess; single-measure catalog precedence is
    untouched."""
    kind, t = model.route("revenue and experience by doctor")
    assert kind == "template" and t.family == "two_measures_by_entity"
    assert {(t.measure_table, t.measure), (t.measure2_table, t.measure2)} == {
        ("visits", "total_charge"), ("doctors", "years_of_experience"),
    }
    assert (t.dimension_table, t.dimension) == ("doctors", "doctor_id")
    rows = {r["doctor_id"]: (r["total_total_charge"],
                             r["total_years_of_experience"])
            for r in model.run_template(t, spark, replicas).collect()}
    live_v = replicas["visits"].filter(~F.col(schemas.META_DELETED))
    live_d = replicas["doctors"].filter(~F.col(schemas.META_DELETED))
    want_rev = {r["doctor_id"]: r["s"] for r in live_v.groupBy("doctor_id")
                .agg(F.sum("total_charge").alias("s")).collect()}
    want_exp = {r["doctor_id"]: r["s"] for r in live_d.groupBy("doctor_id")
                .agg(F.sum("years_of_experience").alias("s")).collect()}
    assert set(rows) == set(want_rev) | set(want_exp) and rows
    for k, (rev, exp) in rows.items():
        assert rev == want_rev.get(k) and exp == want_exp.get(k)

    # 'completed' is an enum value on appointments, a table this route
    # does not read -> the filter-table check refuses the TEMPLATE
    # rather than dropping the qualifier
    import pytest as _pytest
    with _pytest.raises(KeyError):
        model.route_template(
            "revenue and experience by doctor for completed appointments"
        )

    # ambiguous qualifiers refuse
    with _pytest.raises(KeyError, match="ambiguous over two measures"):
        model.route_template("revenue and experience by doctor over 1000")
    with _pytest.raises(KeyError, match="avg-words are ambiguous"):
        model.route_template("average revenue and experience by doctor")
    # unresolvable second measure refuses
    with _pytest.raises(KeyError):
        model.route_template("revenue and shoe size by doctor")
    # audit surface carries both measures
    ex = model.explain_route("revenue and experience by doctor")
    assert ex["measure2"] is not None and ex["kind"] == "template"
    # catalog-first precedence intact for the single-measure question
    assert model.route("billed amount per physician") == (
        "verified", "revenue_by_doctor",
    )


AS_OF = "2024-06-03"  # the engine's pinned as_of (a Monday)


def test_template_relative_dates(spark, model, replicas):
    """r10 (VERDICT r9 task 1): relative/named date phrases resolve
    DETERMINISTICALLY against the pinned as_of into the existing
    date-range slot — 'today', 'yesterday', 'this/last week|month|
    quarter|year', month-name ranges incl. year-wrap, single 'in
    <month>' — composing with every family under the same refusal
    discipline (no as_of, 'recently', double phrases all refuse)."""
    # resolution table (as_of 2024-06-03, a Monday)
    for phrase, want in [
        ("today", ("2024-06-03", "2024-06-03")),
        ("yesterday", ("2024-06-02", "2024-06-02")),
        ("this week", ("2024-06-03", "2024-06-09")),
        ("last week", ("2024-05-27", "2024-06-02")),
        ("next week", ("2024-06-10", "2024-06-16")),
        ("this month", ("2024-06-01", "2024-06-30")),
        ("last month", ("2024-05-01", "2024-05-31")),
        ("last quarter", ("2024-01-01", "2024-03-31")),
        ("this year", ("2024-01-01", "2024-12-31")),
        ("last year", ("2023-01-01", "2023-12-31")),
        ("between march and may", ("2024-03-01", "2024-05-31")),
        # entirely-future range -> most recent past occurrence (same
        # convention as 'in <month>'; r10 review)
        ("between july and september", ("2023-07-01", "2023-09-30")),
        # range containing as_of stays in the current year
        ("between june and august", ("2024-06-01", "2024-08-31")),
        # year-wrap: start month after end month begins the previous year
        ("between november and february", ("2023-11-01", "2024-02-29")),
        ("in may", ("2024-05-01", "2024-05-31")),
        # a month that has not started by as_of = its previous occurrence
        ("in december", ("2023-12-01", "2023-12-31")),
    ]:
        kind, t = model.route(f"how many appointments {phrase}", as_of=AS_OF)
        assert kind == "template" and t.family == "count_table", phrase
        assert t.date_range == ("appointments", "appointment_date") + want, (
            phrase, t.date_range,
        )

    # EXECUTION equals the explicit-ISO route it resolves to
    kind, t = model.route("revenue by doctor last month", as_of=AS_OF)
    assert kind == "template" and t.family == "measure_by_dimension"
    assert t.date_range == ("visits", "visit_date", "2024-05-01", "2024-05-31")
    got = model.run_template(t, spark, replicas).collect()
    _, t_iso = model.route(
        "revenue by doctor from 2024-05-01 to 2024-05-31"
    )
    want = model.run_template(t_iso, spark, replicas).collect()
    assert got == want and got

    # composes with bucket + enum filter families
    kind, t = model.route(
        "completed appointments by month this year", as_of=AS_OF
    )
    assert t.family == "count_by_time_bucket"
    assert t.filters == (("appointments", "status", "completed"),)
    assert t.date_range[2:] == ("2024-01-01", "2024-12-31")

    # audit surface shows the RESOLVED ISO bounds
    ex = model.explain_route(
        "how many appointments between march and may", as_of=AS_OF
    )
    assert ex["date_range"] == (
        "appointments.appointment_date between 2024-03-01 and 2024-05-31"
    )

    # refusals: no as_of pinned; inherently ambiguous words; two
    # phrases; ISO range + relative phrase together
    with pytest.raises(KeyError, match="relative/named date"):
        model.route("how many appointments today")
    with pytest.raises(KeyError, match="relative/named date"):
        model.route("revenue by doctor recently", as_of=AS_OF)
    with pytest.raises(KeyError):
        model.route("appointments today and yesterday", as_of=AS_OF)
    with pytest.raises(KeyError):
        model.route(
            "appointments between 2024-01-01 and 2024-02-01 last week",
            as_of=AS_OF,
        )
    # anchor table declares no time_dimension -> refuse, with or
    # without as_of
    with pytest.raises(KeyError):
        model.route("how many doctors last month", as_of=AS_OF)

    # to-date windows bind [period start, as_of] — incl. abbreviations
    # and the 'so far' phrasing (which contains 'this year' and must
    # bind BEFORE the calendar grammar)
    for phrase, want in [("year to date", ("2024-01-01", "2024-06-03")),
                         ("ytd", ("2024-01-01", "2024-06-03")),
                         ("quarter to date", ("2024-04-01", "2024-06-03")),
                         ("this month so far", ("2024-06-01", "2024-06-03")),
                         ("week to date", ("2024-06-03", "2024-06-03"))]:
        kind, t = model.route(f"how many appointments {phrase}", as_of=AS_OF)
        assert t.date_range[2:] == want, (phrase, t.date_range)

    # rolling windows bind (ending at as_of); calendar-ambiguous and
    # year-explicit phrases refuse rather than silently reinterpreting
    kind, t = model.route("how many appointments last 7 days", as_of=AS_OF)
    assert t.date_range[2:] == ("2024-05-28", "2024-06-03")
    kind, t = model.route(
        "how many appointments in the past 2 weeks", as_of=AS_OF
    )
    assert t.date_range[2:] == ("2024-05-21", "2024-06-03")
    with pytest.raises(KeyError, match="relative/named date"):
        model.route("how many appointments last 3 months", as_of=AS_OF)
    # r11 (VERDICT r10 task 1): an explicit year is the LEAST ambiguous
    # date form — it now binds to exact ISO bounds (see
    # test_template_year_explicit_and_open_dates for the full matrix)
    kind, t = model.route("how many appointments in may 2024", as_of=AS_OF)
    assert t.date_range[2:] == ("2024-05-01", "2024-05-31")
    # 'last 7 days' without an as_of refuses instead of similarity-
    # matching the catalog and dropping the qualifier
    with pytest.raises(KeyError, match="relative/named date"):
        model.route("how many appointments last 7 days")

    # the catalog ESCAPE: a paraphrase of the blessed modified-today
    # question routes verified (the blessed question carries 'today'
    # itself) — with and without as_of; but a relative phrase the
    # catalog does NOT carry never similarity-matches its way through
    assert model.route("Show appointments modified today via CDC") == (
        "verified", "appointments_modified_today",
    )
    assert model.route(
        "Show appointments modified today via CDC", as_of=AS_OF
    ) == ("verified", "appointments_modified_today")
    with pytest.raises(KeyError, match="relative/named date"):
        model.route("Show appointments modified yesterday via CDC")

    # ask() resolves as_of from the _as_of_date convention end-to-end
    dfs = dict(replicas)
    dfs["_as_of_date"] = AS_OF
    out = model.ask("how many appointments last year", spark, dfs).collect()
    want_n = (
        replicas["appointments"]
        .filter(~F.col(schemas.META_DELETED))
        .filter(
            (F.to_date("appointment_date") >= F.lit("2023-01-01"))
            & (F.to_date("appointment_date") <= F.lit("2023-12-31"))
        )
        .count()
    )
    assert out[0]["total_appointments"] == want_n


def test_template_two_measure_time_bucket(spark, model, replicas):
    """r10 (VERDICT r9 task 7): two measures compose with the time-
    bucket slot — one fact + an explicit count word buckets SUM +
    COUNT(*) in one pass; two same-table facts bucket together; facts
    whose anchor tables disagree on the time dimension refuse; and the
    ADVICE r9 collision guard refuses same-name/same-token fact pairs
    in BOTH two-measure families."""
    # one fact + count word, same table ('revenue and visit count')
    kind, t = model.route("revenue and visit count by month")
    assert kind == "template" and t.family == "two_measures_by_time_bucket"
    assert (t.measure_table, t.measure) == ("visits", "total_charge")
    assert t.measure2 is None and t.measure2_table == "visits"
    got = {str(r["month"]): (r["total_total_charge"], r["n"])
           for r in model.run_template(t, spark, replicas).collect()}
    want = {str(r["m"]): (r["s"], r["n"])
            for r in replicas["visits"]
            .filter(~F.col(schemas.META_DELETED))
            .groupBy(F.trunc("visit_date", "month").alias("m"))
            .agg(F.sum("total_charge").alias("s"),
                 F.count("*").alias("n")).collect()}
    assert got == want and got

    # two same-table facts bucket in ONE groupBy (synthetic model —
    # the healthcare schema has one fact per time-dimensioned table)
    from sfguide_getting_started_openflow_postgresql_cdc_spark.semantic.model import (
        ColumnSpec, SemanticModel, TableSpec,
    )
    sales_model = SemanticModel(
        "sales",
        tables=[TableSpec("sales", "sale_id", [
            ColumnSpec("sale_id", "dimension"),
            ColumnSpec("sale_date", "time_dimension"),
            ColumnSpec("amount", "fact"),
            ColumnSpec("cost", "fact"),
        ])],
        relationships=[],
    )
    sales = spark.createDataFrame(
        [(i, f"2024-0{1 + i % 3}-15", 10.0 * i, 1.0 * i) for i in range(12)],
        "sale_id long, sale_date string, amount double, cost double",
    ).withColumn("sale_date", F.col("sale_date").cast("timestamp_ntz"))
    kind, t2 = sales_model.route("amount and cost by month")
    assert kind == "template" and t2.family == "two_measures_by_time_bucket"
    assert {(t2.measure_table, t2.measure),
            (t2.measure2_table, t2.measure2)} == {
        ("sales", "amount"), ("sales", "cost"),
    }
    rows = {str(r["month"]): (r["total_amount"], r["total_cost"])
            for r in sales_model.run_template(
                t2, spark, {"sales": sales}).collect()}
    want2 = {str(r["m"]): (r["a"], r["c"])
             for r in sales.groupBy(F.trunc("sale_date", "month").alias("m"))
             .agg(F.sum("amount").alias("a"), F.sum("cost").alias("c"))
             .collect()}
    assert rows == want2 and len(rows) == 3

    # r10 review: the count trigger covers EVERY count word once a
    # table token names the count target — 'total visits' / 'how many
    # visits' must not silently collapse to a single-measure route
    for phrase in ("revenue and total visits by month",
                   "revenue and how many visits by month"):
        tt = model.route_template(phrase)
        assert tt.family == "two_measures_by_time_bucket", phrase
        assert tt.measure2 is None and tt.measure2_table == "visits"
    # ...while a count word that merely MODIFIES the measure stays
    # single-measure, and a cross-table count target refuses
    assert model.route_template("total revenue by month").family == (
        "measure_by_time_bucket"
    )
    with pytest.raises(KeyError):
        model.route_template("revenue and patient count by month")

    # refusals: anchor tables disagreeing on the time dimension
    # (doctors has none); ambiguous qualifiers over two measures
    with pytest.raises(KeyError):
        model.route_template("revenue and experience by month")
    with pytest.raises(KeyError, match="ambiguous over two measures"):
        model.route_template("revenue and visit count by month over 100")
    with pytest.raises(KeyError, match="avg-words"):
        model.route_template("average revenue and visit count by month")
    # a second resolved fact NEVER silently drops in the by-dimension
    # grammar either
    with pytest.raises(KeyError, match="not supported"):
        model.route_template("revenue and experience by specialization")

    # cross-table two facts with the SAME-NAMED time dimension: each
    # side buckets its own table; per-bucket aggregates full-outer join
    xm = SemanticModel(
        "xm",
        tables=[
            TableSpec("alpha", "id", [
                ColumnSpec("id", "dimension"),
                ColumnSpec("ts", "time_dimension"),
                ColumnSpec("score", "fact"),
            ]),
            TableSpec("beta", "id", [
                ColumnSpec("id", "dimension"),
                ColumnSpec("ts", "time_dimension"),
                ColumnSpec("points", "fact"),
            ]),
        ],
        relationships=[],
    )
    alpha = spark.createDataFrame(
        [(i, f"2024-0{1 + i % 2}-10", 2.0 * i) for i in range(6)],
        "id long, ts string, score double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    beta = spark.createDataFrame(
        [(i, f"2024-0{1 + i % 3}-20", 5.0 * i) for i in range(6)],
        "id long, ts string, points double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    kind, tx = xm.route("score and points by month")
    assert kind == "template" and tx.family == "two_measures_by_time_bucket"
    assert tx.measure_table != tx.measure2_table
    got_x = {str(r["month"]): (r["total_score"], r["total_points"])
             for r in xm.run_template(
                 tx, spark, {"alpha": alpha, "beta": beta}).collect()}
    a_want = {str(r["m"]): r["s"] for r in alpha.groupBy(
        F.trunc("ts", "month").alias("m")).agg(
        F.sum("score").alias("s")).collect()}
    b_want = {str(r["m"]): r["s"] for r in beta.groupBy(
        F.trunc("ts", "month").alias("m")).agg(
        F.sum("points").alias("s")).collect()}
    assert set(got_x) == set(a_want) | set(b_want)
    for k, (s, p) in got_x.items():
        assert s == a_want.get(k) and p == b_want.get(k)

    # ADVICE r9 collision guard: two tables declaring the same fact
    # name make one ask-word resolve as "two measures" — refuse in the
    # entity family AND the bucket family, never emit duplicate
    # total_<col> columns
    dup_model = SemanticModel(
        "dup",
        tables=[
            TableSpec("alpha", "id", [
                ColumnSpec("id", "dimension"),
                ColumnSpec("ts", "time_dimension"),
                ColumnSpec("score", "fact"),
                ColumnSpec("team_id", "dimension"),
            ]),
            TableSpec("beta", "id", [
                ColumnSpec("id", "dimension"),
                ColumnSpec("ts", "time_dimension"),
                ColumnSpec("score", "fact"),
                ColumnSpec("team_id", "dimension"),
            ]),
            TableSpec("teams", "team_id", [
                ColumnSpec("team_id", "dimension"),
            ]),
        ],
        relationships=[
            # Relationship import via the module under test
        ],
    )
    from sfguide_getting_started_openflow_postgresql_cdc_spark.semantic.model import (
        Relationship,
    )
    dup_model.relationships = {
        r.name: r
        for r in [
            Relationship("alpha_to_teams", "alpha", "teams",
                         "team_id", "team_id"),
            Relationship("beta_to_teams", "beta", "teams",
                         "team_id", "team_id"),
        ]
    }
    with pytest.raises(KeyError, match="collide"):
        dup_model.route_template("score by team")
    with pytest.raises(KeyError, match="collide"):
        dup_model.route_template("score by month")

    # audit + catalog precedence intact
    ex = model.explain_route("revenue and visit count by month")
    assert ex["kind"] == "template" and ex["bucket"] == "month"
    assert model.route("total revenue by month")[1].family == (
        "measure_by_time_bucket"
    )


def test_template_year_explicit_and_open_dates(spark, model, replicas):
    """r11 (VERDICT r10 tasks 1+4): year-explicit month forms bind to
    exact ISO bounds WITHOUT an as_of; open-ended phrases (since/after/
    before/until) bind one side and leave the other open; at most one
    date qualifier per question; ambiguous forms keep refusing."""
    # -- year-explicit: binds with AND without as_of -------------------
    for as_of in (None, AS_OF):
        kind, t = model.route("how many appointments in may 2024",
                              as_of=as_of)
        assert kind == "template" and t.family == "count_table"
        assert t.date_range == (
            "appointments", "appointment_date", "2024-05-01", "2024-05-31",
        ), as_of
    for q, want in [
        ("between march 2024 and may 2024", ("2024-03-01", "2024-05-31")),
        # cross-year span
        ("between march 2024 and may 2025", ("2024-03-01", "2025-05-31")),
        ("from november 2023 through february 2024",
         ("2023-11-01", "2024-02-29")),  # leap-aware month end
        ("in december of 2023", ("2023-12-01", "2023-12-31")),
    ]:
        kind, t = model.route(f"how many appointments {q}")
        assert t.date_range[2:] == want, (q, t.date_range)
    # reversed / half-yeared / bare month+year forms refuse — binding
    # would guess or silently drop the stated year
    for q in ("between may 2024 and march 2024",
              "between march and may 2024",
              "between march 2024 and may",
              "may 2024"):
        with pytest.raises(KeyError):
            model.route(f"how many appointments {q}", as_of=AS_OF)
        with pytest.raises(KeyError):
            model.route(f"how many appointments {q}")

    # -- open-ended (as_of 2024-06-03) ---------------------------------
    for q, want in [
        # since: [X start, as_of]; year-less month uses the same
        # most-recent-past convention as 'in <month>'
        ("since march", ("2024-03-01", "2024-06-03")),
        ("since december", ("2023-12-01", "2024-06-03")),
        ("since march 2024", ("2024-03-01", "2024-06-03")),
        ("since 2024-05-15", ("2024-05-15", "2024-06-03")),
        ("since last month", ("2024-05-01", "2024-06-03")),
        ("since yesterday", ("2024-06-02", "2024-06-03")),
        # after: exclusive of X
        ("after 2024-05-15", ("2024-05-16", "2024-06-03")),
        ("after march 2024", ("2024-04-01", "2024-06-03")),
        ("after last week", ("2024-06-03", "2024-06-03")),
        # before/until: open lower bound
        ("before 2024-05-15", ("0001-01-01", "2024-05-14")),
        ("until 2024-05-15", ("0001-01-01", "2024-05-15")),
        ("until may 2024", ("0001-01-01", "2024-05-31")),
        ("before may 2024", ("0001-01-01", "2024-04-30")),
        ("until last month", ("0001-01-01", "2024-05-31")),
        ("before this week", ("0001-01-01", "2024-06-02")),
        ("up to 2024-05-15", ("0001-01-01", "2024-05-15")),
    ]:
        kind, t = model.route(f"how many appointments {q}", as_of=AS_OF)
        assert t.family == "count_table" and t.date_range[2:] == want, (
            q, t.date_range,
        )
    # before/until of ABSOLUTE bounds need no as_of
    kind, t = model.route("how many appointments before 2024-05-15")
    assert t.date_range[2:] == ("0001-01-01", "2024-05-14")
    kind, t = model.route("how many appointments until may 2024")
    assert t.date_range[2:] == ("0001-01-01", "2024-05-31")

    # refusals: since/after without as_of (window ends at as_of);
    # year-less month for before/until (direction-ambiguous); empty or
    # future windows; unbindable operands; double qualifiers
    for q, as_of in [
        ("since 2024-01-01", None),
        ("after march 2024", None),
        ("since march", None),
        ("until september", AS_OF),       # upcoming vs most recent past
        ("before september", None),
        ("since next year", AS_OF),       # starts after as_of -> empty
        ("after today", AS_OF),
        ("since 3pm", AS_OF),             # not a date operand
        ("since the holidays", AS_OF),
        ("since march until may", AS_OF),
        ("in may 2024 and in june 2024", AS_OF),
        ("since march last week", AS_OF),
        ("between 2024-01-01 and 2024-02-01 since march", AS_OF),
    ]:
        with pytest.raises(KeyError):
            model.route(f"how many appointments {q}", as_of=as_of)

    # EXECUTION equals the explicit-ISO route it resolves to
    kind, t = model.route("revenue by doctor since march 2024", as_of=AS_OF)
    got = model.run_template(t, spark, replicas).collect()
    _, t_iso = model.route(
        "revenue by doctor from 2024-03-01 to 2024-06-03"
    )
    want = model.run_template(t_iso, spark, replicas).collect()
    assert got == want and got

    # audit surface shows the RESOLVED bounds (open side included)
    ex = model.explain_route(
        "how many appointments before 2024-05-15"
    )
    assert ex["date_range"] == (
        "appointments.appointment_date between 0001-01-01 and 2024-05-14"
    )

    # ADVICE r10: digit-carrying phrases never take the catalog escape
    # even when the blessed question carries the digit-free tokens —
    # 'modified today in may 2024' is NOT the blessed modified-today ask
    with pytest.raises(KeyError):
        model.route("Show appointments modified today in may 2024 via CDC")
    with pytest.raises(KeyError):
        model.route("Show appointments modified today in may 2024 via CDC",
                    as_of=AS_OF)
    # ...while the digit-free escape keeps working
    assert model.route("Show appointments modified today via CDC") == (
        "verified", "appointments_modified_today",
    )


def test_template_two_measure_date_composition(spark, model, replicas):
    """r11 (VERDICT r10 task 7): a date-range/relative/open qualifier
    filters the SHARED time axis and composes with BOTH two-measure
    families; thresholds and avg-words keep refusing; tables that
    disagree on (or lack) a time dimension refuse."""
    for q in ("revenue and visit count by month since march",
              "revenue and visit count by month in may 2024",
              "revenue and visit count by month last quarter"):
        kind, t = model.route(q, as_of=AS_OF)
        assert kind == "template", q
        assert t.family == "two_measures_by_time_bucket", q
        assert t.date_range is not None and t.date_range[0] == "*", q
        assert t.date_range[1] == "visit_date", q

    # EXECUTION: the '*' anchor filters every table read
    kind, t = model.route(
        "revenue and visit count by month from 2024-01-01 to 2024-03-31"
    )
    got = {str(r["month"]): (r["total_total_charge"], r["n"])
           for r in model.run_template(t, spark, replicas).collect()}
    base = (
        replicas["visits"]
        .filter(~F.col(schemas.META_DELETED))
        .filter((F.to_date("visit_date") >= F.lit("2024-01-01"))
                & (F.to_date("visit_date") <= F.lit("2024-03-31")))
    )
    want = {str(r["m"]): (r["s"], r["n"])
            for r in base.groupBy(F.trunc("visit_date", "month").alias("m"))
            .agg(F.sum("total_charge").alias("s"),
                 F.count("*").alias("n")).collect()}
    assert got == want and got

    # by_entity composition over a synthetic two-table model whose
    # tables AGREE on the time dimension (the healthcare model has no
    # such fact pair: doctors declares no time dimension)
    from sfguide_getting_started_openflow_postgresql_cdc_spark.semantic.model import (
        ColumnSpec, Relationship, SemanticModel, TableSpec,
    )
    em = SemanticModel(
        "em",
        tables=[
            TableSpec("teams", "team_id", [
                ColumnSpec("team_id", "dimension"),
                ColumnSpec("name", "dimension"),
            ]),
            TableSpec("alpha", "id", [
                ColumnSpec("id", "dimension"),
                ColumnSpec("ts", "time_dimension"),
                ColumnSpec("score", "fact"),
                ColumnSpec("team_id", "dimension"),
            ]),
            TableSpec("beta", "id", [
                ColumnSpec("id", "dimension"),
                ColumnSpec("ts", "time_dimension"),
                ColumnSpec("points", "fact"),
                ColumnSpec("team_id", "dimension"),
            ]),
        ],
        relationships=[
            Relationship("alpha_to_teams", "alpha", "teams",
                         "team_id", "team_id"),
            Relationship("beta_to_teams", "beta", "teams",
                         "team_id", "team_id"),
        ],
    )
    alpha = spark.createDataFrame(
        [(i, f"2024-0{1 + i % 3}-10", 2.0 * i, i % 2) for i in range(9)],
        "id long, ts string, score double, team_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    beta = spark.createDataFrame(
        [(i, f"2024-0{1 + i % 3}-20", 5.0 * i, i % 2) for i in range(9)],
        "id long, ts string, points double, team_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    kind, tx = em.route(
        "score and points by team from 2024-01-01 to 2024-02-28"
    )
    assert kind == "template" and tx.family == "two_measures_by_entity"
    assert tx.date_range == ("*", "ts", "2024-01-01", "2024-02-28")
    got_e = {r["team_id"]: (r["total_score"], r["total_points"])
             for r in em.run_template(
                 tx, spark,
                 {"alpha": alpha, "beta": beta, "teams": None}).collect()}
    fa = alpha.filter(F.to_date("ts") <= "2024-02-28")
    fb = beta.filter(F.to_date("ts") <= "2024-02-28")
    want_e = {}
    for r in fa.groupBy("team_id").agg(F.sum("score").alias("s")).collect():
        want_e[r["team_id"]] = (r["s"], None)
    for r in fb.groupBy("team_id").agg(F.sum("points").alias("p")).collect():
        s = want_e.get(r["team_id"], (None, None))[0]
        want_e[r["team_id"]] = (s, r["p"])
    assert got_e == want_e and got_e

    # refusals unchanged: thresholds/avg over two measures; a measure
    # pair whose tables disagree on (or lack) the time dimension
    with pytest.raises(KeyError, match="ambiguous over two measures"):
        model.route_template("revenue and visit count by month over 100")
    with pytest.raises(KeyError, match="avg-words"):
        model.route_template("average revenue and visit count by month")
    # doctors declares no time dimension -> by_entity + date refuses
    with pytest.raises(KeyError):
        model.route("revenue and experience by doctor since march",
                    as_of=AS_OF)
    # ...while the same ask WITHOUT the date qualifier still routes
    kind, t0 = model.route("revenue and experience by doctor")
    assert t0.family == "two_measures_by_entity" and t0.date_range is None

    # audit surface names every filtered table for the '*' anchor
    ex = model.explain_route(
        "revenue and visit count by month in may 2024"
    )
    assert ex["date_range"] == (
        "visits.visit_date between 2024-05-01 and 2024-05-31"
    )


def test_open_ended_iso_phrases_never_take_catalog_escape(spark):
    """r11 review: 'revenue since 2024-03-01' must not similarity-match
    a blessed 'revenue since last month' — the ISO bound lives in
    digits the escape's token comparison strips, so routing there would
    silently answer the WRONG window. Digit-free open phrases keep
    escaping (the blessed question resolves the same phrase itself)."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.semantic.model import (
        ColumnSpec, SemanticModel, TableSpec,
    )

    em = SemanticModel(
        "esc",
        tables=[TableSpec("sales", "sale_id", [
            ColumnSpec("sale_id", "dimension"),
            ColumnSpec("sale_date", "time_dimension"),
            ColumnSpec("amount", "fact", ["revenue"]),
        ])],
        relationships=[],
    )

    @em.verified("rev_since", "revenue since last month", tables=["sales"])
    def _rev(spark, dfs):  # pragma: no cover - never run here
        return dfs["sales"]

    # digit-free paraphrase: escape fires (blessed question carries the
    # same open phrase and resolves it itself)
    assert em.route("the revenue since last month") == (
        "verified", "rev_since",
    )
    # digit-carrying operand: refuse, with AND without as_of — the
    # blessed window is a different window
    for as_of in (None, AS_OF):
        with pytest.raises(KeyError):
            em.route("revenue since 2024-03-01", as_of=as_of)
    with pytest.raises(KeyError):
        em.route("revenue until 2025", as_of=AS_OF)
