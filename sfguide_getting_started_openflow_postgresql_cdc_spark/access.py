"""Role/grant and network-rule enforcement (SURVEY §2.A18, the
functional core).

The reference's setup script (sql/1.snowflake_setup.sql:14-105) does
three testable things besides warehouse provisioning: creates a runtime
ROLE and GRANTs it object privileges, GRANTs read on the semantic-model
stage, and declares an EGRESS NETWORK RULE that is the only path the CDC
connector may use to reach PostgreSQL. This module implements those
semantics for a single-process engine:

- :class:`AccessControl` — roles, ``grant``/``revoke`` of per-object
  privileges, and ``check`` (raises PermissionError). Role hierarchy is
  supported the same way ``GRANT ROLE a TO ROLE b`` composes: a role
  inherits every privilege of roles granted to it.
- :class:`NetworkRule` / ``egress_allowed`` — host:port allow-list
  consulted by the JDBC snapshot path; a bootstrap from a database not
  covered by a rule fails closed, mirroring how the connector cannot
  reach endpoints outside the EXTERNAL ACCESS INTEGRATION.
- USER principals: ``create_user`` / ``grant_role_to_user`` model the
  warehouse session contract the reference exercises with ``USE ROLE``
  (sql/1.snowflake_setup.sql:14,42,81,110 switch roles mid-script;
  :37 grants the runtime role to the admin role) — a principal may only
  assume roles granted to it, and every object decision then flows
  through the assumed role's effective privileges.

Credential verification and account-level DDL stay out of scope — there
is no secret store in one Spark driver process; what is enforceable
(and tested) is the authorization decision itself: who may assume which
role, and what that role may read.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class NetworkRule:
    """EGRESS allow-list entry (host:port pairs), mirroring
    ``CREATE NETWORK RULE ... MODE = EGRESS TYPE = HOST_PORT``
    (sql/1.snowflake_setup.sql:75-78)."""

    name: str
    host_ports: tuple[str, ...]
    mode: str = "EGRESS"


def jdbc_host_ports(url: str) -> tuple[str, ...]:
    """Extract EVERY ``host:port`` endpoint from a JDBC url — multi-host
    failover urls (``jdbc:postgresql://h1:5432,h2:5432/db``) list several,
    and the driver may connect to ANY of them, so egress checks must
    cover them all. ``jdbc:sqlite:/path`` has no endpoint -> ``()``."""
    m = re.search(r"jdbc:[a-z0-9]+://([^/?;]+)", url)
    if not m:
        return ()
    return tuple(hp for hp in m.group(1).split(",") if hp)


def jdbc_host_port(url: str) -> str:
    """First endpoint of ``url`` (display helper — egress checks use
    :func:`jdbc_host_ports`, which covers failover endpoints too)."""
    hps = jdbc_host_ports(url)
    return hps[0] if hps else ""


def egress_allowed(url: str, rules: list[NetworkRule] | tuple[NetworkRule, ...]) -> bool:
    """Fail-closed: every endpoint the driver could fail over to must be
    allow-listed; a url with no parseable endpoint is denied."""
    hps = jdbc_host_ports(url)
    if not hps:
        return False
    return all(
        any(r.mode == "EGRESS" and hp in r.host_ports for r in rules)
        for hp in hps
    )


class PermissionDenied(PermissionError):
    pass


@dataclass(frozen=True)
class ExternalAccessIntegration:
    """``CREATE EXTERNAL ACCESS INTEGRATION`` twin (reference:
    sql/1.snowflake_setup.sql:83-91): a named, ENABLED/disabled bundle
    of ALLOWED network rules; egress through the integration requires
    USAGE on it (a grantable privilege like any object's)."""

    name: str
    allowed_network_rules: tuple[str, ...]
    enabled: bool = True
    comment: str = ""


@dataclass(frozen=True)
class Secret:
    """Credential object twin. The VALUE never appears in repr/str/
    errors — a single-process engine cannot provide an HSM, but it can
    enforce the access decision (USAGE grant) and keep the secret out
    of logs, which is the part queries can observe."""

    name: str
    value: str = field(repr=False)

    def reveal(self) -> str:
        return self.value


@dataclass
class AccessControl:
    """Role -> privilege store with Snowflake-style composition.

    Privileges are ``(action, object)`` pairs; ``grant_role`` composes
    hierarchies exactly like ``GRANT ROLE QUICKSTART_ROLE TO ROLE
    OPENFLOW_ADMIN`` (sql/1.snowflake_setup.sql:38)."""

    _privs: dict[str, set[tuple[str, str]]] = field(default_factory=dict)
    _role_grants: dict[str, set[str]] = field(default_factory=dict)
    _user_roles: dict[str, set[str]] = field(default_factory=dict)
    _user_default_role: dict[str, str] = field(default_factory=dict)
    network_rules: list[NetworkRule] = field(default_factory=list)
    _integrations: dict[str, ExternalAccessIntegration] = field(
        default_factory=dict
    )
    _secrets: dict[str, Secret] = field(default_factory=dict)

    # -- DDL twins ---------------------------------------------------------
    def create_role(self, role: str) -> "AccessControl":
        self._privs.setdefault(role, set())
        self._role_grants.setdefault(role, set())
        return self

    def grant(self, action: str, obj: str, to: str) -> "AccessControl":
        self._require_role(to)
        self._privs[to].add((action.upper(), obj))
        return self

    def revoke(self, action: str, obj: str, frm: str) -> "AccessControl":
        self._require_role(frm)
        self._privs[frm].discard((action.upper(), obj))
        return self

    def grant_role(self, role: str, to: str) -> "AccessControl":
        self._require_role(role)
        self._require_role(to)
        self._role_grants[to].add(role)
        return self

    def add_network_rule(self, rule: NetworkRule) -> "AccessControl":
        self.network_rules.append(rule)
        return self

    # -- user principals ---------------------------------------------------
    def create_user(self, name: str, default_role: str) -> "AccessControl":
        """``CREATE USER ... DEFAULT_ROLE = r`` twin; the default role
        must exist and is implicitly granted to the user."""
        self._require_role(default_role)
        self._user_roles.setdefault(name, set()).add(default_role)
        self._user_default_role[name] = default_role
        return self

    def grant_role_to_user(self, role: str, user: str) -> "AccessControl":
        """``GRANT ROLE r TO USER u`` — lets the user ``USE ROLE r``."""
        self._require_role(role)
        self._require_user(user)
        self._user_roles[user].add(role)
        return self

    def _require_user(self, user: str) -> None:
        if user not in self._user_roles:
            raise KeyError(f"unknown user {user!r} (create_user first)")

    def user_roles(self, user: str) -> frozenset[str]:
        self._require_user(user)
        return frozenset(self._user_roles[user])

    def default_role(self, user: str) -> str:
        self._require_user(user)
        return self._user_default_role[user]

    def check_user_role(self, user: str, role: str) -> None:
        """The USE ROLE gate: a principal may only assume granted roles."""
        self._require_user(user)
        if role not in self._user_roles[user]:
            raise PermissionDenied(
                f"user {user!r} was not granted role {role!r} "
                f"(holds {sorted(self._user_roles[user])})"
            )

    # -- decisions ---------------------------------------------------------
    def _require_role(self, role: str) -> None:
        if role not in self._privs:
            raise KeyError(f"unknown role {role!r} (create_role first)")

    def _effective(self, role: str, seen: set[str] | None = None) -> set[tuple[str, str]]:
        seen = seen if seen is not None else set()
        if role in seen:
            return set()
        seen.add(role)
        out = set(self._privs.get(role, ()))
        for sub in self._role_grants.get(role, ()):
            out |= self._effective(sub, seen)
        return out

    def can(self, role: str, action: str, obj: str) -> bool:
        self._require_role(role)
        return (action.upper(), obj) in self._effective(role)

    def check(self, role: str, action: str, obj: str) -> None:
        if not self.can(role, action, obj):
            raise PermissionDenied(
                f"role {role!r} lacks {action.upper()} on {obj!r}"
            )

    def check_egress(self, url: str) -> None:
        """Fail closed: a JDBC endpoint must be covered by an EGRESS
        network rule, like the connector's EXTERNAL ACCESS INTEGRATION."""
        if not egress_allowed(url, self.network_rules):
            raise PermissionDenied(
                f"egress to {jdbc_host_port(url) or url!r} not covered by "
                f"any network rule "
                f"({[r.name for r in self.network_rules] or 'none defined'})"
            )

    # -- external access integrations / secrets (A18 remainder) ----------
    def create_integration(
        self, integration: ExternalAccessIntegration
    ) -> "AccessControl":
        """Register an EXTERNAL ACCESS INTEGRATION; every allowed
        network rule must already exist (fail at DDL time, not at
        egress time)."""
        known = {r.name for r in self.network_rules}
        missing = [
            n for n in integration.allowed_network_rules if n not in known
        ]
        if missing:
            raise KeyError(
                f"integration references unknown network rules {missing}"
            )
        self._integrations[integration.name] = integration
        return self

    def create_secret(self, name: str, value: str) -> "AccessControl":
        self._secrets[name] = Secret(name, value)
        return self

    def use_secret(self, name: str, role: str) -> str:
        """Read a secret's value AS a role — requires USAGE on
        ``secret:<name>`` (``grant('USAGE', 'secret:pg', role)``)."""
        if name not in self._secrets:
            raise KeyError(f"unknown secret {name!r}")
        self.check(role, "USAGE", f"secret:{name}")
        return self._secrets[name].reveal()

    def check_egress_via_integration(
        self, url: str, integration: str, role: str
    ) -> None:
        """The connector's full egress decision: the ROLE must hold
        USAGE on the integration (sql/1.snowflake_setup.sql:91), the
        integration must be ENABLED, and every failover endpoint of
        ``url`` must be covered by the integration's ALLOWED rules (not
        merely by any rule that exists) — all fail-closed."""
        if integration not in self._integrations:
            raise KeyError(f"unknown integration {integration!r}")
        self.check(role, "USAGE", f"integration:{integration}")
        integ = self._integrations[integration]
        if not integ.enabled:
            raise PermissionDenied(f"integration {integration!r} is disabled")
        rules = [
            r
            for r in self.network_rules
            if r.name in integ.allowed_network_rules
        ]
        if not egress_allowed(url, rules):
            raise PermissionDenied(
                f"egress to {jdbc_host_port(url) or url!r} not covered by "
                f"integration {integration!r} rules "
                f"({[r.name for r in rules] or 'none'})"
            )

    # -- introspection (SHOW twins, sql/1.snowflake_setup.sql:111-121) ----
    def show_roles(self) -> list[str]:
        """``SHOW ROLES`` twin — sorted, deterministic."""
        return sorted(self._privs)

    def show_grants_to_role(self, role: str) -> list[str]:
        """``SHOW GRANTS TO ROLE r`` twin: direct object privileges plus
        granted roles, as sorted display strings (the reference runs
        this as its setup verification)."""
        self._require_role(role)
        out = [f"{a} ON {o}" for a, o in self._privs[role]]
        out += [f"ROLE {r}" for r in self._role_grants.get(role, ())]
        return sorted(out)

    def show_grants_on(self, obj: str) -> list[str]:
        """``SHOW GRANTS ON <object>`` twin: every (action, role)
        holding a DIRECT privilege on the object."""
        out = []
        for role, privs in self._privs.items():
            out += [f"{a} TO ROLE {role}" for a, o in privs if o == obj]
        return sorted(out)

    def show_integrations(self) -> list[str]:
        """``SHOW INTEGRATIONS`` twin — name + enabled flag."""
        return [
            f"{n} ({'ENABLED' if i.enabled else 'DISABLED'})"
            for n, i in sorted(self._integrations.items())
        ]

    def describe_integration(self, name: str) -> dict:
        """``DESC INTEGRATION`` twin — never includes secret values."""
        if name not in self._integrations:
            raise KeyError(f"unknown integration {name!r}")
        i = self._integrations[name]
        return {
            "name": i.name,
            "enabled": i.enabled,
            "allowed_network_rules": list(i.allowed_network_rules),
            "comment": i.comment,
        }

