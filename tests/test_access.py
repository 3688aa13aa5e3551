"""Role/grant + network-rule enforcement (SURVEY §2.A18 functional
core): authorization decisions, role hierarchy, egress gating of the
JDBC snapshot path, and the Engine's role-scoped reader."""

import pytest

from sfguide_getting_started_openflow_postgresql_cdc_spark.access import (
    AccessControl,
    NetworkRule,
    PermissionDenied,
    egress_allowed,
    jdbc_host_port,
)

# driver-budget default excludes this heavyweight suite (pytest.ini);
# builders run it via `-m ""` before shipping engine changes
pytestmark = pytest.mark.slow


def _ac() -> AccessControl:
    return (
        AccessControl()
        .create_role("quickstart_role")
        .grant("SELECT", "appointments", to="quickstart_role")
        .grant("SELECT", "doctors", to="quickstart_role")
    )


def test_grant_revoke_and_check():
    ac = _ac()
    assert ac.can("quickstart_role", "select", "appointments")  # case-folded
    ac.check("quickstart_role", "SELECT", "doctors")  # no raise
    with pytest.raises(PermissionDenied, match="lacks SELECT on 'visits'"):
        ac.check("quickstart_role", "SELECT", "visits")
    ac.revoke("SELECT", "doctors", frm="quickstart_role")
    assert not ac.can("quickstart_role", "SELECT", "doctors")
    with pytest.raises(KeyError, match="unknown role"):
        ac.check("nobody", "SELECT", "appointments")


def test_role_hierarchy_composes_and_tolerates_cycles():
    """GRANT ROLE a TO ROLE b -> b inherits a's privileges
    (sql/1.snowflake_setup.sql:38)."""
    ac = _ac().create_role("openflow_admin")
    ac.grant_role("quickstart_role", to="openflow_admin")
    assert ac.can("openflow_admin", "SELECT", "appointments")
    assert not ac.can("openflow_admin", "SELECT", "visits")
    # a cycle must not hang or grant anything new
    ac.grant_role("openflow_admin", to="quickstart_role")
    assert ac.can("quickstart_role", "SELECT", "appointments")


def test_network_rules_gate_jdbc_urls():
    rule = NetworkRule("postgres_network_rule", ("db.example.com:5432",))
    assert jdbc_host_port("jdbc:postgresql://db.example.com:5432/healthcare") == (
        "db.example.com:5432"
    )
    assert egress_allowed("jdbc:postgresql://db.example.com:5432/h", [rule])
    assert not egress_allowed("jdbc:postgresql://evil.example.com:5432/h", [rule])
    assert not egress_allowed("jdbc:sqlite:/tmp/x.db", [rule])  # no endpoint

    ac = AccessControl().add_network_rule(rule)
    ac.check_egress("jdbc:postgresql://db.example.com:5432/h")  # no raise
    with pytest.raises(PermissionDenied, match="egress"):
        ac.check_egress("jdbc:postgresql://other.host:5432/h")


def test_jdbc_loader_fails_closed_before_connecting(spark):
    """load_jdbc_table with an AccessControl must refuse a non-allowed
    endpoint BEFORE any connection attempt (no driver needed)."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark import schemas
    from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.loader import (
        load_jdbc_table,
    )

    ac = AccessControl().add_network_rule(
        NetworkRule("pg", ("allowed.host:5432",))
    )
    with pytest.raises(PermissionDenied, match="not covered"):
        load_jdbc_table(
            spark,
            "jdbc:postgresql://blocked.host:5432/healthcare",
            "appointments",
            schemas.HEALTHCARE_TABLES["appointments"],
            access=ac,
        )


def test_engine_role_reader(spark, tmp_path):
    from sfguide_getting_started_openflow_postgresql_cdc_spark.engine import Engine

    ac = _ac()
    eng = Engine(
        spark, str(tmp_path / "w"), write_partitions=1, access=ac
    ).bootstrap()
    r = eng.reader("quickstart_role")
    assert r.table("appointments").count() == 170
    with pytest.raises(PermissionDenied):
        r.table("visits")
    ac.grant("SELECT", "visits", to="quickstart_role")
    assert r.table("visits").count() == 100

    no_ac = Engine(spark, str(tmp_path / "w2"), write_partitions=1)
    with pytest.raises(ValueError, match="without an AccessControl"):
        no_ac.reader("quickstart_role")


def test_egress_multi_host_failover_urls_fail_closed():
    """A multi-host JDBC url is only allowed when EVERY failover endpoint
    is allow-listed — the driver may connect to any of them."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.access import (
        NetworkRule,
        egress_allowed,
        jdbc_host_ports,
    )

    assert jdbc_host_ports("jdbc:postgresql://h1:5432,h2:5432/db") == (
        "h1:5432",
        "h2:5432",
    )
    one = NetworkRule("r1", ("h1:5432",))
    both = NetworkRule("r2", ("h1:5432", "h2:5432"))
    assert not egress_allowed("jdbc:postgresql://h1:5432,h2:5432/db", [one])
    assert egress_allowed("jdbc:postgresql://h1:5432,h2:5432/db", [both])
    assert egress_allowed("jdbc:postgresql://h1:5432/db", [one])


def test_role_scoped_verified_queries_and_ask(spark, tmp_path):
    """Verified queries honor the role: a role lacking SELECT on ANY
    table a verified query declares is refused — including through the
    NL ask() path, where routing succeeds but execution is denied
    (reference grant separation, sql/1.snowflake_setup.sql:40-58)."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.engine import Engine

    ac = (
        AccessControl()
        .create_role("analyst")
        .grant("SELECT", "appointments", to="analyst")
    )
    eng = Engine(
        spark, str(tmp_path / "w"), write_partitions=1, access=ac
    ).bootstrap()
    r = eng.reader("analyst")

    # granted surface: total_appointments reads only appointments
    assert r.verified("total_appointments").collect()[0][0] == 170
    assert r.ask("how many appointments in total?").collect()[0][0] == 170

    # revenue_by_doctor reads doctors+visits -> refused, even via ask()
    with pytest.raises(PermissionDenied, match="doctors|visits"):
        r.verified("revenue_by_doctor")
    with pytest.raises(PermissionDenied, match="doctors|visits"):
        r.ask("what is the total revenue by doctor?")

    # partial grant is still refused (needs BOTH tables)
    ac.grant("SELECT", "doctors", to="analyst")
    with pytest.raises(PermissionDenied, match="visits"):
        r.verified("revenue_by_doctor")
    ac.grant("SELECT", "visits", to="analyst")
    assert r.verified("revenue_by_doctor").count() == 10


def test_user_principals_and_use_role(spark, tmp_path):
    """USER principals close the 'Engine.reader trusts the string' gap:
    a session opens under the user's DEFAULT_ROLE, USE ROLE succeeds
    only for roles granted to the user, and object decisions then flow
    through the assumed role (reference switches roles with USE ROLE —
    sql/1.snowflake_setup.sql:14,42,81,110)."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.engine import Engine

    ac = (
        AccessControl()
        .create_role("analyst")
        .create_role("admin")
        .grant("SELECT", "appointments", to="analyst")
        .grant("SELECT", "doctors", to="admin")
        .grant("SELECT", "visits", to="admin")
        .create_user("dana", default_role="analyst")
    )
    eng = Engine(
        spark, str(tmp_path / "w"), write_partitions=1, access=ac
    ).bootstrap()

    s = eng.login("dana")
    assert s.role == "analyst"
    assert s.table("appointments").count() == 170
    with pytest.raises(PermissionDenied):  # analyst lacks doctors
        s.table("doctors")
    with pytest.raises(PermissionDenied, match="not granted role"):
        s.use_role("admin")  # dana does not hold admin
    with pytest.raises(KeyError, match="unknown user"):
        eng.login("mallory")

    ac.grant_role_to_user("admin", "dana")
    s.use_role("admin")
    assert s.role == "admin"
    assert s.table("doctors").count() == 10
    with pytest.raises(PermissionDenied):  # admin lacks appointments
        s.table("appointments")
    # role-scoped verified queries compose with the user session
    assert s.verified("revenue_by_doctor").count() == 10
    with pytest.raises(PermissionDenied):
        s.verified("total_appointments")


def test_template_ask_honors_grant_surface(spark, tmp_path):
    """The parameterized-template ask path must enforce SELECT on the
    template's resolved tables, same as verified queries."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.engine import Engine

    ac = (
        AccessControl()
        .create_role("analyst")
        .grant("SELECT", "visits", to="analyst")
        .grant("SELECT", "doctors", to="analyst")
    )
    eng = Engine(
        spark, str(tmp_path / "w"), write_partitions=1, access=ac
    ).bootstrap()
    r = eng.reader("analyst")

    # resolved template reads visits+doctors -> allowed, grouped result
    out = {row[0]: row[1] for row in r.ask("total revenue by specialization").collect()}
    assert out and all(v is not None for v in out.values())

    # count_table template resolves patients -> denied (no grant)
    with pytest.raises(PermissionDenied, match="patients"):
        r.ask("how many patients")


def test_external_access_integration_and_secrets():
    """A18 remainder (r6 'what's missing' #3): EXTERNAL ACCESS
    INTEGRATION gates egress on (USAGE grant) x (enabled) x (ALLOWED
    rules only); secrets are USAGE-gated and never leak through repr;
    SHOW twins report grants deterministically."""
    import pytest

    from sfguide_getting_started_openflow_postgresql_cdc_spark.access import (
        AccessControl,
        ExternalAccessIntegration,
        NetworkRule,
        PermissionDenied,
    )

    ac = AccessControl()
    ac.create_role("quickstart_role").create_role("other_role")
    ac.add_network_rule(
        NetworkRule("postgres_network_rule", ("pg.example.com:5432",))
    )
    with pytest.raises(KeyError):  # unknown rule fails at DDL time
        ac.create_integration(
            ExternalAccessIntegration("bad", ("no_such_rule",))
        )
    ac.create_integration(
        ExternalAccessIntegration(
            "quickstart_pgcdc_access", ("postgres_network_rule",)
        )
    )
    ac.grant("USAGE", "integration:quickstart_pgcdc_access", to="quickstart_role")

    url = "jdbc:postgresql://pg.example.com:5432/db"
    # granted role + enabled + covered endpoint -> allowed
    ac.check_egress_via_integration(url, "quickstart_pgcdc_access", "quickstart_role")
    # ungranted role -> denied (USAGE gate)
    with pytest.raises(PermissionDenied):
        ac.check_egress_via_integration(url, "quickstart_pgcdc_access", "other_role")
    # endpoint outside the integration's ALLOWED rules -> denied even
    # though a rule covering it EXISTS globally
    ac.add_network_rule(NetworkRule("other_rule", ("evil.example.com:5432",)))
    with pytest.raises(PermissionDenied):
        ac.check_egress_via_integration(
            "jdbc:postgresql://evil.example.com:5432/db",
            "quickstart_pgcdc_access",
            "quickstart_role",
        )
    # disabled integration -> denied
    ac.create_integration(
        ExternalAccessIntegration(
            "disabled_access", ("postgres_network_rule",), enabled=False
        )
    )
    ac.grant("USAGE", "integration:disabled_access", to="quickstart_role")
    with pytest.raises(PermissionDenied):
        ac.check_egress_via_integration(url, "disabled_access", "quickstart_role")

    # secrets: USAGE-gated, repr-safe
    ac.create_secret("pg_creds", "hunter2")
    with pytest.raises(PermissionDenied):
        ac.use_secret("pg_creds", "quickstart_role")
    ac.grant("USAGE", "secret:pg_creds", to="quickstart_role")
    assert ac.use_secret("pg_creds", "quickstart_role") == "hunter2"
    assert "hunter2" not in repr(ac._secrets["pg_creds"])
    assert "hunter2" not in str(ac.describe_integration("quickstart_pgcdc_access"))

    # SHOW twins (the reference's setup-verification block)
    assert "quickstart_role" in ac.show_roles()
    grants = ac.show_grants_to_role("quickstart_role")
    assert "USAGE ON integration:quickstart_pgcdc_access" in grants
    assert "USAGE ON secret:pg_creds" in grants
    assert ac.show_grants_on("secret:pg_creds") == ["USAGE TO ROLE quickstart_role"]
    assert ac.show_integrations() == [
        "disabled_access (DISABLED)",
        "quickstart_pgcdc_access (ENABLED)",
    ]
    d = ac.describe_integration("quickstart_pgcdc_access")
    assert d["allowed_network_rules"] == ["postgres_network_rule"]


def test_engine_ask_and_explain_route_share_as_of(spark, tmp_path):
    """r10 review: Engine.explain_route must audit EXACTLY what
    Engine.ask runs — both pin the engine's as_of, so a relative-date
    question audits as resolved ISO bounds and then executes, instead
    of the audit logging a refusal for a question ask() answers."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "w"), write_partitions=1).bootstrap()
    q = "revenue by doctor last month"
    ex = eng.explain_route(q)
    assert ex["kind"] == "template"
    assert ex["date_range"] == (
        "visits.visit_date between 2024-05-01 and 2024-05-31"
    )
    rows = eng.ask(q).collect()
    assert isinstance(rows, list)  # executes under the same bounds
    # the bare model-level audit (no as_of) refuses — the engine
    # wrapper is what closes the audit/execution gap
    bare = eng.model.explain_route(q)
    assert bare["kind"] == "refused"
