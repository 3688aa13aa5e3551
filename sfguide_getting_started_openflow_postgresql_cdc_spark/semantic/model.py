"""Semantic-model catalog (SURVEY.md §2.J).

Re-expresses the reference's Cortex-Analyst semantic model
(``semantic-models/healthcare_cdc_semantic_model.yaml``) as a typed
registry the engine can act on:

- logical tables with PKs, synonyms, and column classification into
  dimensions / time_dimensions / facts (yaml:21,110,194,355,535);
- join relationships (yaml:552-582) used to auto-build fact⋈dim joins;
- the default soft-delete filter applied to every semantic query
  (yaml:593-594,613-614,636-638);
- verified queries — blessed NL-question -> query pairs (yaml:583-649) —
  as named DataFrame builders.

The model is declared in code and round-trips through a compact YAML/JSON
dict so it can ship as a sidecar file like the reference's stage upload
(sql/1.snowflake_setup.sql:52-58).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark import schemas


@dataclass
class ColumnSpec:
    name: str
    kind: str  # 'dimension' | 'time_dimension' | 'fact'
    synonyms: list[str] = field(default_factory=list)
    description: str = ""
    # CHECK-constraint enum values (reference:
    # sql/0.init_healthcare.sql:77,79) — the router's WHERE-filter slot
    # resolves question words like 'completed' against these, never
    # against free text
    values: list[str] = field(default_factory=list)


@dataclass
class TableSpec:
    name: str
    primary_key: str
    columns: list[ColumnSpec]
    synonyms: list[str] = field(default_factory=list)
    description: str = ""

    def column(self, name: str) -> ColumnSpec:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(f"{self.name}.{name}")


@dataclass
class Relationship:
    """left_table.left_key -> right_table.right_key (many-to-one)."""

    name: str
    left_table: str
    right_table: str
    left_key: str
    right_key: str


# routing lexicon shared by the verified-query router and the template
# router: function words carry no signal; count-words mark aggregation
_STOP = {
    "the", "a", "an", "of", "in", "on", "by", "to", "for", "do",
    "we", "have", "is", "are", "were", "was", "what", "which",
    "how", "via", "all", "per", "with", "and", "or", "show", "me",
    "each", "every",
}
_COUNT_WORDS = {"count", "number", "many", "much", "total"}
_AVG_WORDS = {"average", "avg", "mean"}
# grains F.trunc/date_trunc accept; 'by month' etc. resolve to a
# date_trunc over the subject's first-declared time_dimension
_BUCKET_WORDS = {"year", "quarter", "month", "week", "day"}


def _toks(s: str) -> frozenset[str]:
    """Content tokens, naive-plural-folded ('doctors' -> 'doctor')."""
    import re as _re

    return frozenset(
        w[:-1] if w.endswith("s") and len(w) > 3 else w
        for w in _re.findall(r"[a-z]+", s.lower())
        if w not in _STOP
    )


@dataclass(frozen=True)
class TemplateRoute:
    """A parameterized-query routing decision (SURVEY §2.J3 breadth):
    the deterministic router resolved the question into a template
    family plus model objects — ``tables`` is the grant surface a
    role-scoped caller must hold SELECT on."""

    # 'count_table' | 'count_by_dimension' | 'measure_by_dimension'
    # | 'avg_measure_by_dimension' | 'top_dimension_by_measure'
    # | 'count_by_time_bucket' | 'measure_by_time_bucket'
    # | 'avg_measure_by_time_bucket' | 'two_measures_by_entity'
    # | 'two_measures_by_time_bucket' (measure2=None there means the
    #   second measure is COUNT(*) of measure2_table)
    family: str
    tables: tuple[str, ...]
    measure: str | None = None
    measure_table: str | None = None
    dimension: str | None = None
    dimension_table: str | None = None
    limit: int | None = None
    # WHERE-filter slot: ((table, column, enum_value), ...) — resolved
    # from declared CHECK-enum values only
    filters: tuple = ()
    # time-bucket grain for the *_by_time_bucket families
    bucket: str | None = None
    # measure-threshold slot (r8 verdict task 5): (op, value) applied to
    # the AGGREGATED output column — the HAVING clause ('doctors with
    # revenue over 1000'); op in {'>', '>=', '<', '<='}
    having: tuple | None = None
    # second measure for the two_measures_by_entity family ('revenue
    # and experience by doctor') — each measure aggregates in its own
    # table and the per-entity aggregates full-outer join on the
    # entity key (route.dimension carries the OUTPUT key name)
    measure2: str | None = None
    measure2_table: str | None = None
    # date-range slot: (table, time_dimension, start_iso, end_iso) —
    # an inclusive WHERE on the anchor table's first-declared
    # time_dimension ('appointments between 2025-03-01 and 2025-05-31')
    date_range: tuple | None = None


# date-range qualifier: ISO dates only — free-text dates would need a
# locale parser, and a wrong guess silently changes the answer
_RANGE_RE = (
    r"\b(?:between|from)\s+(\d{4}-\d{2}-\d{2})\s+"
    r"(?:and|to|through)\s+(\d{4}-\d{2}-\d{2})\b"
)
# measure-threshold qualifier: comparator word(s) + a literal number;
# longest comparators first so 'more than' never half-matches
_CMP_OPS = (
    ("greater than or equal to", ">="),
    ("less than or equal to", "<="),
    ("greater than", ">"),
    ("less than", "<"),
    ("more than", ">"),
    ("at least", ">="),
    ("at most", "<="),
    ("over", ">"),
    ("above", ">"),
    ("under", "<"),
    ("below", "<"),
)
_THRESH_RE = (
    r"\b(?:having\s+|whose\s+)?("
    + "|".join(w for w, _ in _CMP_OPS)
    + r")\s+(\d+(?:\.\d+)?)(?![,.\-]?\d)"
)
# LOOSE detectors for the refusal guard: a comparator-plus-number or a
# between-ISO-dates phrase that the STRICT slot regexes could not bind
# ('over 1,000', 'above 2024-01-01') must refuse, never fall through to
# a catalog answer that drops it — the strict regex alone would treat
# the malformed number as invisible
_THRESH_DETECT = (
    r"\b(?:" + "|".join(w for w, _ in _CMP_OPS) + r")\s+\d"
)
_RANGE_DETECT = r"\b(?:between|from)\s+\d{4}-\d{2}-\d{2}\b"

# ---------------------------------------------------------------------------
# Relative/named-date resolution (r9 verdict task 1). The reference's own
# blessed question is relative ("Show appointments modified today via CDC",
# semantic-models/healthcare_cdc_semantic_model.yaml:599-612) — these
# phrases resolve DETERMINISTICALLY against the engine's pinned ``as_of``
# date (the ``_as_of_date`` convention the verified catalog already uses),
# never against the wall clock: the same question + the same as_of always
# yields the same ISO bounds. Ambiguous vagueness ("recently", "lately")
# has no deterministic resolution and always refuses.
# ---------------------------------------------------------------------------
_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        "january february march april may june july august september "
        "october november december".split()
    )
}
_MONTH_RE = "|".join(_MONTHS)
# month-name range: 'between March and May' / 'from November to February'
# (year-wrap: a start month AFTER the end month starts in as_of's
# PREVIOUS year — the most recent such span ending in as_of's year)
_MONTH_RANGE_RE = (
    rf"\b(?:between|from)\s+({_MONTH_RE})\s+"
    rf"(?:and|to|through)\s+({_MONTH_RE})\b"
)
# single named month: 'in March' — the most recent occurrence of that
# month not after as_of (as_of's year when the month has started by
# as_of, else the previous year). 'in' anchors the grammar so the modal
# verb 'may' never binds as a month.
_MONTH_IN_RE = rf"\bin\s+({_MONTH_RE})\b"
_REL_WORD_RE = (
    r"\b(?:today|yesterday"
    r"|(?:this|last|next)\s+(?:week|month|quarter|year))\b"
)
# rolling window: 'last/past N days|weeks' binds [as_of - span + 1,
# as_of]; N months/years REFUSES (calendar-ambiguous: rolling vs
# calendar months differ and a wrong guess silently changes the answer)
_REL_ROLLING_RE = r"\b(?:last|past)\s+(\d+)\s+(day|week|month|year)s?\b"
# to-date windows: [calendar-period start, as_of] — checked BEFORE the
# this/last grammar ('this year so far' contains 'this year')
_REL_TO_DATE_RE = (
    r"\b(?:(year|quarter|month|week)\s+to\s+date|(ytd|qtd|mtd|wtd)"
    r"|this\s+(year|quarter|month|week)\s+so\s+far)\b"
)
# a month name followed by an explicit 4-digit year. The STRICT forms
# below ('in May 2024', 'between March 2024 and May 2025') bind to
# exact ISO bounds WITHOUT an as_of — an explicit year is the LEAST
# ambiguous date form a user can type (r10 verdict task 1). Any
# month+year the strict grammars could not consume still refuses:
# digits never become routing tokens, so falling through would
# SILENTLY IGNORE the stated year.
_MONTH_YEAR_RE = rf"\b(?:{_MONTH_RE})\s+(?:of\s+)?\d{{4}}\b"
# year-explicit month range: 'between March 2024 and May 2024' /
# 'from November 2023 through February 2024' — BOTH years stated (a
# year on only one side would need inference, which is exactly the
# ambiguity the explicit form exists to avoid; those refuse via
# _MONTH_YEAR_RE with a message asking for both years)
_MONTH_YEAR_RANGE_RE = (
    rf"\b(?:between|from)\s+({_MONTH_RE})\s+(?:of\s+)?(\d{{4}})\s+"
    rf"(?:and|to|through)\s+({_MONTH_RE})\s+(?:of\s+)?(\d{{4}})\b"
)
# single year-explicit month: 'in May 2024' / 'in May of 2024'
_MONTH_YEAR_IN_RE = rf"\bin\s+({_MONTH_RE})\s+(?:of\s+)?(\d{{4}})\b"
# open-ended date phrases (r10 verdict task 4): one bound stated, the
# other side open — 'since March', 'after 2025-01-01', 'until May
# 2024', 'before last week'. Operand forms: ISO date, month name
# (year-explicit or as_of-relative), or a relative phrase. 'through'
# is deliberately NOT an open preposition (it is a CLOSED-range
# connector: 'from March through May'); say 'until' instead.
_OPEN_RE = (
    r"\b(since|after|before|until|till|up\s+to)\s+"
    r"(?:(\d{4}-\d{2}-\d{2})"
    rf"|({_MONTH_RE})(?:\s+(?:of\s+)?(\d{{4}}))?"
    r"|(today|yesterday|(?:this|last|next)\s+(?:week|month|quarter|year)))\b"
)
# LOOSE open-phrase detector: 'since/until/till' anywhere, or
# 'after/before/up to' followed by something date-shaped, must refuse
# when the strict grammar could not bind ('since 3pm', 'after the
# holidays') instead of falling through to a catalog answer
_OPEN_DETECT = (
    r"\b(?:since|till|until)\b"
    rf"|\b(?:after|before|up\s+to)\s+(?:\d{{4}}|{_MONTH_RE}"
    r"|today\b|yesterday\b|this\s|last\s|next\s)"
)
# LOOSE detector for the refusal guard (mirrors _RANGE_DETECT): any
# relative/named-date phrase — or an inherently ambiguous one — that the
# strict resolution below could not bind (no pinned as_of, two ranges,
# unparseable family) must refuse, never fall through to a catalog match
# that silently drops or reinterprets it. The ONE escape, handled in
# ``route``: a similarity-matched VERIFIED question whose own text
# carries the same relative tokens (e.g. 'modified today' reaching the
# blessed modified-today query, which resolves 'today' itself).
_REL_DETECT = (
    rf"(?:{_REL_WORD_RE}|{_MONTH_RANGE_RE}|{_MONTH_IN_RE}"
    rf"|{_REL_ROLLING_RE}|{_REL_TO_DATE_RE}"
    rf"|{_MONTH_YEAR_RE}|{_OPEN_DETECT}"
    r"|\b(?:recently|lately)\b)"
)
# patterns that must NEVER reach the verified-catalog escape in
# ``route`` (ADVICE r10): token comparison is digit-stripped, so
# 'last 3 months' is token-identical to 'last month' and 'in may 2024'
# to 'in may' — a blessed question carrying the digit-free phrase
# would silently answer the WRONG window. These forms either bind
# strictly (month+year) or refuse outright (rolling months/years,
# recently/lately); the escape is reserved for phrases whose tokens
# carry their full meaning.
_ESCAPE_BLOCK_RE = (
    rf"(?:{_MONTH_YEAR_RE}"
    r"|\b(?:last|past)\s+\d+\s+(?:day|week|month|year)s?\b"
    # open-ended phrases with a DIGIT-carrying operand ('since
    # 2024-03-01', 'until 2025') — the token comparison would see only
    # the preposition and happily escape to a blessed question whose
    # own open phrase names a DIFFERENT bound (r11 review)
    r"|\b(?:since|after|before|until|till|up\s+to)\s+\d"
    r"|\b(?:recently|lately)\b)"
)
# open lower bound for 'before/until X' — far below any real data
_DATE_MIN = "0001-01-01"


def _month_end(year: int, month: int):
    import datetime

    if month == 12:
        return datetime.date(year, 12, 31)
    return datetime.date(year, month + 1, 1) - datetime.timedelta(days=1)


def _resolve_absolute_range(q: str) -> tuple[str, str, str] | None:
    """Bind the first YEAR-EXPLICIT date phrase in ``q`` — 'in May
    2024', 'between March 2024 and May 2025' — to exact ISO bounds.
    Needs NO as_of: an explicit year is fully deterministic (r10
    verdict task 1). Returns (q_with_phrase_consumed, start_iso,
    end_iso) or None; raises KeyError for a reversed range."""
    import datetime
    import re

    def consume(m) -> str:
        return q[: m.start()] + " " + q[m.end():]

    m = re.search(_MONTH_YEAR_RANGE_RE, q)
    if m:
        m1, y1 = _MONTHS[m.group(1)], int(m.group(2))
        m2, y2 = _MONTHS[m.group(3)], int(m.group(4))
        lo = datetime.date(y1, m1, 1)
        hi = _month_end(y2, m2)
        if lo > hi:
            raise KeyError(
                f"reversed date range ({m.group(0)!r}) — the start month "
                "is after the end month, refusing rather than guessing "
                "which was meant"
            )
        return consume(m), lo.isoformat(), hi.isoformat()

    m = re.search(_MONTH_YEAR_IN_RE, q)
    if m:
        mo, y = _MONTHS[m.group(1)], int(m.group(2))
        lo = datetime.date(y, mo, 1)
        return consume(m), lo.isoformat(), _month_end(y, mo).isoformat()

    return None


def _resolve_open_range(q: str, as_of) -> tuple[str, str, str] | None:
    """Bind the first OPEN-ENDED date phrase in ``q`` (r10 verdict task
    4) — one bound stated, the other side open:

    - ``since X``  -> [X_start, as_of]   (inclusive of X; needs as_of)
    - ``after X``  -> [X_end + 1 day, as_of]   (exclusive; needs as_of)
    - ``before X`` -> [open, X_start - 1 day]  (exclusive)
    - ``until/till/up to X`` -> [open, X_end]  (inclusive)

    X is an ISO date, a month name (year-explicit, or resolved against
    as_of for since/after under the same most-recent-past convention as
    'in <month>'), or a relative phrase ('since last month'). The open
    side uses ``_DATE_MIN``. before/until of a YEAR-LESS month name
    refuses: 'until September' is direction-ambiguous (the upcoming
    September vs the most recent past one), unlike since/after where
    the as_of upper bound forces the past reading. ``as_of`` may be
    None — only phrases that genuinely need it raise then. Raises
    KeyError for unbindable or empty/future windows."""
    import datetime
    import re

    m = re.search(_OPEN_RE, q)
    if m is None:
        return None
    prep = re.sub(r"\s+", " ", m.group(1))
    iso, month, year, rel = m.group(2), m.group(3), m.group(4), m.group(5)

    def need_as_of(why: str):
        if as_of is None:
            raise KeyError(
                f"{prep!r} {why} needs a pinned as_of date — refusing "
                "rather than reading the wall clock"
            )

    if iso:
        x_lo = x_hi = datetime.date.fromisoformat(iso)
    elif month and year:
        mo, y = _MONTHS[month], int(year)
        x_lo, x_hi = datetime.date(y, mo, 1), _month_end(y, mo)
    elif month:
        if prep in ("before", "until", "till", "up to"):
            raise KeyError(
                f"'{prep} {month}' without a year is direction-ambiguous "
                "(the upcoming one vs the most recent past one) — state "
                f"the year ('{prep} {month} 2024') or use an ISO date"
            )
        need_as_of(f"of a year-less month name ({month!r})")
        mo = _MONTHS[month]
        y = as_of.year - (1 if mo > as_of.month else 0)
        x_lo, x_hi = datetime.date(y, mo, 1), _month_end(y, mo)
    else:
        need_as_of(f"of a relative phrase ({rel!r})")
        _, lo_s, hi_s = _resolve_relative_range(rel, as_of)
        x_lo = datetime.date.fromisoformat(lo_s)
        x_hi = datetime.date.fromisoformat(hi_s)

    rest = q[: m.start()] + " " + q[m.end():]
    if prep in ("since", "after"):
        need_as_of("(the window ends at as_of)")
        lo = x_lo if prep == "since" else x_hi + datetime.timedelta(days=1)
        if lo > as_of:
            raise KeyError(
                f"{m.group(0)!r} yields an empty window (starts after "
                "the pinned as_of) — refusing rather than answering "
                "with an empty frame"
            )
        return rest, lo.isoformat(), as_of.isoformat()
    hi = x_hi if prep in ("until", "till", "up to") else (
        x_lo - datetime.timedelta(days=1)
    )
    return rest, _DATE_MIN, hi.isoformat()


def _resolve_relative_range(q: str, as_of) -> tuple[str, str, str] | None:
    """Bind the FIRST relative/named-date phrase in ``q`` against the
    pinned ``as_of`` (a ``datetime.date``): returns (q_with_phrase_
    consumed, start_iso, end_iso), or None when no phrase matches.
    Weeks are ISO Monday..Sunday. Raises KeyError for phrases that are
    detectable but inherently ambiguous ('recently')."""
    import datetime
    import re

    if re.search(r"\b(?:recently|lately)\b", q):
        raise KeyError(
            "'recently'/'lately' have no deterministic date bounds — "
            "refusing rather than guessing"
        )
    if re.search(_MONTH_YEAR_RE, q):
        # strict year-explicit forms were already consumed by
        # _resolve_absolute_range before this runs — what remains is a
        # month+year phrase the strict grammar could NOT parse (a year
        # on only one side of a range, a bare 'May 2024' with no 'in')
        raise KeyError(
            "a month+year phrase did not match the year-explicit "
            "grammar — use 'in <month> <year>' or state BOTH years "
            "('between March 2024 and May 2024'); binding it against "
            "the as_of year would silently ignore the stated one"
        )

    def consume(m) -> str:
        return q[: m.start()] + " " + q[m.end():]

    m = re.search(_REL_ROLLING_RE, q)
    if m:
        n, unit = int(m.group(1)), m.group(2)
        if unit in ("month", "year"):
            raise KeyError(
                f"'last {n} {unit}s' is calendar-ambiguous (rolling vs "
                "calendar) — use 'last month'/'last year' or an ISO "
                "range instead"
            )
        span = n * (7 if unit == "week" else 1)
        if span < 1:
            raise KeyError(f"empty rolling window: {m.group(0)!r}")
        lo = as_of - datetime.timedelta(days=span - 1)
        return consume(m), lo.isoformat(), as_of.isoformat()

    m = re.search(_REL_TO_DATE_RE, q)
    if m:
        unit = (m.group(1) or m.group(3) or
                {"ytd": "year", "qtd": "quarter",
                 "mtd": "month", "wtd": "week"}[m.group(2)])
        if unit == "year":
            lo = datetime.date(as_of.year, 1, 1)
        elif unit == "quarter":
            lo = datetime.date(as_of.year, 3 * ((as_of.month - 1) // 3) + 1, 1)
        elif unit == "month":
            lo = as_of.replace(day=1)
        else:  # week (ISO Monday)
            lo = as_of - datetime.timedelta(days=as_of.weekday())
        return consume(m), lo.isoformat(), as_of.isoformat()

    m = re.search(_REL_WORD_RE, q)
    if m:
        phrase = re.sub(r"\s+", " ", m.group(0))
        if phrase == "today":
            lo = hi = as_of
        elif phrase == "yesterday":
            lo = hi = as_of - datetime.timedelta(days=1)
        else:
            which, unit = phrase.split(" ")
            if unit == "week":
                lo = as_of - datetime.timedelta(days=as_of.weekday())
                if which == "last":
                    lo -= datetime.timedelta(days=7)
                elif which == "next":
                    lo += datetime.timedelta(days=7)
                hi = lo + datetime.timedelta(days=6)
            elif unit == "month":
                lo = as_of.replace(day=1)
                if which == "last":
                    lo = (lo - datetime.timedelta(days=1)).replace(day=1)
                elif which == "next":
                    lo = _month_end(lo.year, lo.month) + datetime.timedelta(
                        days=1
                    )
                hi = _month_end(lo.year, lo.month)
            elif unit == "quarter":
                qm = 3 * ((as_of.month - 1) // 3) + 1
                lo = datetime.date(as_of.year, qm, 1)
                if which == "last":
                    lo = (lo - datetime.timedelta(days=1)).replace(day=1)
                    lo = datetime.date(lo.year, 3 * ((lo.month - 1) // 3) + 1, 1)
                elif which == "next":
                    lo = _month_end(lo.year, lo.month + 2) + datetime.timedelta(
                        days=1
                    )
                hi = _month_end(lo.year, lo.month + 2)
            else:  # year
                y = as_of.year + {"last": -1, "next": 1, "this": 0}[which]
                lo = datetime.date(y, 1, 1)
                hi = datetime.date(y, 12, 31)
        return consume(m), lo.isoformat(), hi.isoformat()

    m = re.search(_MONTH_RANGE_RE, q)
    if m:
        m1, m2 = _MONTHS[m.group(1)], _MONTHS[m.group(2)]
        wrap = 1 if m1 > m2 else 0  # year-wrap: Nov..Feb
        lo = datetime.date(as_of.year - wrap, m1, 1)
        hi_year = as_of.year
        if lo > as_of:  # entirely-future range: the most recent past
            # occurrence instead ('between july and september' asked in
            # June means LAST summer) — same convention as 'in <month>';
            # binding the future window would silently answer with an
            # empty frame (r10 review)
            lo = lo.replace(year=lo.year - 1)
            hi_year -= 1
        return consume(m), lo.isoformat(), _month_end(hi_year, m2).isoformat()

    m = re.search(_MONTH_IN_RE, q)
    if m:
        mo = _MONTHS[m.group(1)]
        y = as_of.year - (1 if mo > as_of.month else 0)
        lo = datetime.date(y, mo, 1)
        return consume(m), lo.isoformat(), _month_end(y, mo).isoformat()

    return None


class SemanticModel:
    def __init__(
        self,
        name: str,
        tables: list[TableSpec],
        relationships: list[Relationship],
        description: str = "",
    ):
        self.name = name
        self.description = description
        self.tables = {t.name: t for t in tables}
        self.relationships = {r.name: r for r in relationships}
        self._verified: dict[str, tuple[str, object]] = {}
        self._verified_tables: dict[str, tuple[str, ...]] = {}

    # -- validation -----------------------------------------------------
    def validate(self, dfs: dict[str, DataFrame]) -> list[str]:
        """Check every declared table/column/relationship exists in the
        provided DataFrames; returns a list of problems (empty == valid)."""
        problems = []
        for t in self.tables.values():
            if t.name not in dfs:
                problems.append(f"missing table {t.name}")
                continue
            have = set(dfs[t.name].columns)
            for c in t.columns:
                if c.name not in have:
                    problems.append(f"missing column {t.name}.{c.name}")
            if t.primary_key not in have:
                problems.append(f"missing pk {t.name}.{t.primary_key}")
        for r in self.relationships.values():
            for side, key in ((r.left_table, r.left_key), (r.right_table, r.right_key)):
                if side not in dfs:
                    problems.append(f"relationship {r.name}: missing table {side}")
                elif key not in dfs[side].columns:
                    problems.append(f"relationship {r.name}: missing key {side}.{key}")
        return problems

    # -- join auto-builder -----------------------------------------------
    def join(
        self, dfs: dict[str, DataFrame], left: str, right: str, how: str = "inner"
    ) -> DataFrame:
        """Join two logical tables along the declared relationship —
        the dim side is broadcast (reference dims are tiny; at scale this
        keeps the fact side shuffle-free)."""
        for r in self.relationships.values():
            if r.left_table == left and r.right_table == right:
                return dfs[left].join(
                    F.broadcast(dfs[right]),
                    dfs[left][r.left_key] == dfs[right][r.right_key],
                    how,
                )
        raise KeyError(f"no relationship {left} -> {right}")

    # -- verified queries --------------------------------------------------
    def verified(self, name: str, question: str, tables: list[str] | None = None):
        """Decorator registering a blessed question -> DataFrame builder.

        ``tables`` declares which logical tables the query reads — the
        authorization surface: a role must hold SELECT on every one of
        them to run the query through a role-scoped reader (reference
        separation: stage/table grants, sql/1.snowflake_setup.sql:40-58).
        Defaults (conservatively) to EVERY table in the model."""

        def deco(fn):
            self._verified[name] = (question, fn)
            self._verified_tables[name] = (
                tuple(tables) if tables is not None else tuple(self.tables)
            )
            return fn

        return deco

    def verified_tables(self, name: str) -> tuple[str, ...]:
        """Logical tables a verified query reads (its grant surface)."""
        if name not in self._verified:
            raise KeyError(f"unknown verified query {name!r}")
        return self._verified_tables[name]

    def verified_queries(self) -> dict[str, str]:
        return {k: q for k, (q, _) in self._verified.items()}

    def run_verified(self, name: str, spark: SparkSession, dfs: dict[str, DataFrame]):
        _, fn = self._verified[name]
        return fn(spark, dfs)

    # -- NL routing (SURVEY §2.J3, deterministic part) ---------------------
    def route_question(self, question: str, min_score: float = 0.2) -> str:
        """Route a natural-language question to the best-matching
        VERIFIED query — the deterministic core of the reference's agent
        hook (`sql/1.snowflake_setup.sql:93-105`): the agent's grounding
        is exactly this blessed-question catalog; no model is involved
        here, so routing is a lexical scorer, reproducible and testable.

        Scoring: symmetric token coverage — a question token matches if
        the verified question can reach it directly or through a synonym
        group, and vice versa; the score is matched tokens over total
        tokens on both sides. Synonym groups come from (a) naive plural
        folding (physicians == physician), (b) the model's table/column
        synonyms (so "billed amount per physician" reaches
        revenue_by_doctor via the total_charge and doctors groups), and
        (c) one built-in aggregation-word group (count/number/many/
        total/much). Expansion is used for MATCHING only, never added to
        the denominators — token groups overlap transitively and would
        otherwise bloat every union. Ties break by name for determinism.
        Raises KeyError when nothing clears ``min_score`` — an agent
        should refuse, not guess."""
        import re

        # function words carry no routing signal and inflate Jaccard
        # between unrelated questions ("what is the ..." matching)
        stop = {
            "the", "a", "an", "of", "in", "on", "by", "to", "for", "do",
            "we", "have", "is", "are", "were", "was", "what", "which",
            "how", "via", "all", "per", "with", "and", "or", "show", "me",
        }

        def toks(s: str) -> frozenset[str]:
            # naive plural fold: 'doctors' -> 'doctor'
            return frozenset(
                w[:-1] if w.endswith("s") and len(w) > 3 else w
                for w in re.findall(r"[a-z]+", s.lower())
                if w not in stop
            )

        # token -> all tokens of every name in the same synonym group
        expand: dict[str, set[str]] = {}

        def add_group(names: set[str]) -> None:
            group = {w for n in names for w in toks(n)}
            for w in group:
                expand.setdefault(w, set()).update(group)

        for t in self.tables.values():
            add_group({t.name} | set(t.synonyms))
            for c in t.columns:
                add_group({c.name} | set(c.synonyms))
        add_group({"count", "number", "many", "total", "much"})

        def expanded(ts: frozenset[str]) -> frozenset[str]:
            out = set(ts)
            for w in ts:
                out.update(expand.get(w, ()))
            return frozenset(out)

        q_raw = toks(question)
        q_exp = expanded(q_raw)
        best_name, best_score = None, 0.0
        for name in sorted(self._verified):
            v_raw = toks(self._verified[name][0])
            v_exp = expanded(v_raw)
            denom = len(q_raw) + len(v_raw)
            score = (
                (len(q_raw & v_exp) + len(v_raw & q_exp)) / denom
                if denom
                else 0.0
            )
            if score > best_score:
                best_name, best_score = name, score
        if best_name is None or best_score < min_score:
            raise KeyError(
                f"no verified query matches {question!r} "
                f"(best score {best_score:.2f} < {min_score})"
            )
        return best_name

    # -- template routing (SURVEY §2.J3 breadth) ---------------------------
    def _resolve_column(self, text_toks: frozenset, kinds: set[str]):
        """(table, column) whose name-or-synonym tokens are fully
        contained in ``text_toks``; longest match wins, then name order
        — deterministic. None when nothing resolves."""
        best = None
        for t in self.tables.values():
            for c in t.columns:
                if c.kind not in kinds:
                    continue
                for cand in (c.name, *c.synonyms):
                    ct = _toks(cand)
                    if ct and ct <= text_toks:
                        key = (-len(ct), t.name, c.name)
                        if best is None or key < best[0]:
                            best = (key, t.name, c.name)
        return (best[1], best[2]) if best else None

    def _resolve_columns_all(self, text_toks: frozenset, kinds: set[str]):
        """EVERY (table, column, consumed_tokens) whose name-or-synonym
        tokens are fully contained in ``text_toks`` — the multi-measure
        twin of ``_resolve_column`` (which picks the single best match).
        Deterministic (table, column) order."""
        out = []
        for tname in sorted(self.tables):
            for c in sorted(self.tables[tname].columns, key=lambda c: c.name):
                if c.kind not in kinds:
                    continue
                consumed: set = set()
                for cand in (c.name, *c.synonyms):
                    ct = _toks(cand)
                    if ct and ct <= text_toks:
                        consumed |= ct
                if consumed:
                    out.append((tname, c.name, frozenset(consumed)))
        return out

    def _resolve_tables(self, text_toks: frozenset) -> list[str]:
        hits = []
        for name in sorted(self.tables):
            t = self.tables[name]
            if any(
                _toks(n) and _toks(n) <= text_toks
                for n in (t.name, *t.synonyms)
            ):
                hits.append(name)
        return hits

    def _rel_between(self, a: str, b: str):
        """The declared one-hop relationship between two tables, in
        either direction -> (a_key, b_key); KeyError when absent."""
        for r in self.relationships.values():
            if r.left_table == a and r.right_table == b:
                return r.left_key, r.right_key
            if r.left_table == b and r.right_table == a:
                return r.right_key, r.left_key
        raise KeyError(f"no relationship between {a} and {b}")

    def route_template(self, question: str, as_of=None) -> TemplateRoute:
        """Resolve a question into a parameterized template — the
        deterministic generalization beyond the blessed catalog:

        - ``<measure> by <dimension>``  -> grouped SUM (tables joined
          along a declared relationship when they differ)
        - ``average <measure> by <dimension>`` -> grouped AVG (an
          avg-word on the measure side flips SUM to AVG)
        - ``top N <dimension> by <measure>`` -> grouped SUM, ordered
          desc, LIMIT N (the by-clause names the MEASURE here — tried
          when the by-side fails to resolve as a dimension)
        - ``count ... by <dimension>``  -> grouped COUNT(*)
        - ``how many <table>``          -> table COUNT(*) — only when
          every content token is explained by count-words + the table
          (leftover tokens mean the question asks something MORE
          specific, and guessing would silently drop the qualifier)

        Two further families (r6 advice — the refusals real users hit
        first):

        - WHERE-filter slot: a question word matching a declared
          CHECK-enum value ('completed appointments by doctor') becomes
          an equality filter on that column; the value must live on a
          table the route already reads, or the question refuses —
          silently dropping a qualifier would change the answer.
        - time-bucket dimension: ``by month|week|day|quarter|year``
          groups the subject on date_trunc of its FIRST-declared
          time_dimension (the model's declaration order is the
          convention for "the" event time of a table).
        - ``by <table>`` grouping: a by-clause naming a TABLE
          ('appointments by doctor') groups the subject on its declared
          foreign key to that table (the relationship's subject-side
          column) — no join needed, the key IS the dimension.

        Two SLOT QUALIFIERS compose with every family (r8 verdict task
        5 — the refusals most common after the r8 combined slots):

        - measure-threshold ('doctors with revenue over 1000'): a
          comparator word + literal number becomes a HAVING on the
          aggregated output column; without a by-clause, an
          <entity> + <measure> question groups the measure on its
          declared FK to the entity (the threshold is inexpressible in
          the blessed catalog, so the template must win);
        - date-range ('appointments between 2025-03-01 and
          2025-05-31'): two ISO dates become an inclusive WHERE on the
          anchor (fact/subject) table's first-declared time_dimension;
          a question carrying the qualifier refuses when that table
          declares no time_dimension. YEAR-EXPLICIT month forms bind
          WITHOUT an as_of (r10 verdict task 1) — 'in May 2024',
          'between March 2024 and May 2025' (both years stated;
          reversed ranges refuse). OPEN-ENDED phrases bind one side
          and leave the other open (r10 verdict task 4): 'since X' ->
          [X start, as_of], 'after X' -> [day after X, as_of] (both
          need as_of), 'before X' -> [open, day before X], 'until X'
          -> [open, X end] (no as_of needed for ISO / year-explicit X;
          a year-less month is direction-ambiguous for before/until
          and refuses). With a pinned ``as_of``
          (``datetime.date`` or ISO string — the ``_as_of_date``
          convention), RELATIVE/NAMED phrases resolve into the same
          slot deterministically: 'today', 'yesterday', 'this/last/next
          week|month|quarter|year', 'last/past N days|weeks' (rolling,
          ending at as_of), 'year/quarter/month/week to date' (and the
          ytd/qtd/mtd/wtd abbreviations / 'this year so far'),
          'between March and May' (month names; a
          start month after the end month wraps into the previous
          year), 'in March'. Without an as_of, or for inherently
          ambiguous phrases ('recently', 'last 3 months' — rolling vs
          calendar, a month+year form the strict grammar cannot parse —
          the year would be silently ignored), the question refuses — a
          wall-clock fallback would make routing non-reproducible. AT
          MOST ONE date qualifier may appear; two refuse as ambiguous.

        And a TWO-MEASURE family ('revenue and experience by doctor' —
        the last r8 refusal gap): exactly two distinct fact columns
        resolving alongside an entity by-clause aggregate each in their
        own table and full-outer join per entity; avg-words and
        threshold qualifiers are ambiguous over two measures (which
        measure do they bind?) and refuse, while a date-range/relative
        qualifier filters the SHARED time axis and composes (r10
        verdict task 7) — provided every table read agrees on its
        first-declared time dimension, else refuse.

        Measures/dimensions resolve through the model's declared column
        names and synonyms only; unresolvable questions raise KeyError —
        refuse, never guess."""
        import re

        q = question.lower()
        # slot qualifiers are CONSUMED from the question text before any
        # token math, so the family grammars below never see them.
        # Date binding runs in four passes — ISO closed range, then
        # year-explicit (no as_of needed), then open-ended, then
        # relative — and AT MOST ONE may fire: a question carrying two
        # date qualifiers is ambiguous (which one did the user mean to
        # scope the answer by?) and refuses.
        import datetime

        if isinstance(as_of, str):
            as_of = datetime.date.fromisoformat(as_of)
        date_range = None

        def _bind(lo: str, hi: str, rest: str) -> None:
            nonlocal date_range, q
            if date_range is not None:
                raise KeyError(
                    "question carries more than one date qualifier — "
                    f"ambiguous, refusing: {question!r}"
                )
            date_range = (lo, hi)
            q = rest

        drm = re.search(_RANGE_RE, q)
        if drm:
            _bind(drm.group(1), drm.group(2),
                  q[: drm.start()] + " " + q[drm.end():])
        ab = _resolve_absolute_range(q)  # KeyError -> refusal
        if ab is not None:
            rest, lo, hi = ab
            _bind(lo, hi, rest)
        op = _resolve_open_range(q, as_of)  # KeyError -> refusal
        if op is not None:
            rest, lo, hi = op
            _bind(lo, hi, rest)
        if as_of is not None:
            rel = _resolve_relative_range(q, as_of)  # KeyError -> refusal
            if rel is not None:
                rest, lo, hi = rel
                _bind(lo, hi, rest)
        if date_range is not None and (
            re.search(_RANGE_RE, q)
            or _resolve_absolute_range(q) is not None
            or _resolve_open_range(q, as_of) is not None
            or (
                as_of is not None
                and _resolve_relative_range(q, as_of) is not None
            )
        ):
            # a SECOND phrase of the same kind the sequential passes
            # above could not catch ('between March 2024 and May 2024
            # and in June 2024')
            raise KeyError(
                "question carries more than one date qualifier — "
                f"ambiguous, refusing: {question!r}"
            )
        having = None
        thm = re.search(_THRESH_RE, q)
        if thm:
            having = (dict(_CMP_OPS)[thm.group(1)], float(thm.group(2)))
            q = q[: thm.start()] + " " + q[thm.end():]
        filters = tuple(self._match_enum_filters(q))
        ftoks: frozenset = (
            frozenset().union(
                *(_toks(v.replace("_", " ")) for _, _, v in filters)
            )
            if filters
            else frozenset()
        )

        def _check_filters(route: TemplateRoute) -> TemplateRoute:
            """Every return path funnels through here: validates the
            enum-filter slot and ATTACHES the threshold/date-range
            slots (anchored on the route's fact/subject table)."""
            for ft, _, _ in route.filters:
                if ft not in route.tables:
                    raise KeyError(
                        f"filter value on {ft} does not apply to any table "
                        f"this question reads ({route.tables}) — refusing "
                        f"rather than dropping the qualifier: {question!r}"
                    )
            if date_range is not None:
                if route.family in (
                    "two_measures_by_entity", "two_measures_by_time_bucket"
                ):
                    # r11 (VERDICT r10 task 7): a date range filters the
                    # SHARED time axis, not a measure — unambiguous iff
                    # every table read agrees on the time dimension
                    # (by_time_bucket already enforces this; by_entity
                    # checks here). The '*' anchor applies the WHERE to
                    # every route table in run_template.
                    dims = {t: _first_time_dim(t) for t in route.tables}
                    if len(set(dims.values())) > 1:
                        raise KeyError(
                            "the two measures' tables disagree on the "
                            f"time dimension ({dims}) — a date range is "
                            f"ambiguous here, refusing: {question!r}"
                        )
                    route = replace(
                        route,
                        date_range=(
                            "*", next(iter(dims.values())), *date_range
                        ),
                    )
                else:
                    anchor = route.measure_table or route.tables[0]
                    route = replace(
                        route,
                        date_range=(
                            anchor,
                            _first_time_dim(anchor),  # KeyError -> refusal
                            *date_range,
                        ),
                    )
            if having is not None:
                route = replace(route, having=having)
            return route

        def _table_toks(name: str) -> set:
            return set().union(
                *(_toks(n) for n in (name, *self.tables[name].synonyms))
            )

        def _first_time_dim(table: str) -> str:
            for c in self.tables[table].columns:
                if c.kind == "time_dimension" and not c.name.startswith("_"):
                    return c.name
            raise KeyError(f"{table} declares no time_dimension to bucket by")

        m = re.search(r"\b(?:by|per|for each|grouped by)\s+(.+)$", q)
        if m:
            # filter-value tokens are consumed by the WHERE slot on BOTH
            # sides: qualifiers trail as often as they lead ('billed
            # amount by month for completed appointments')
            lt = _toks(q[: m.start()]) - ftoks
            rt = _toks(m.group(1)) - ftoks
            dim = self._resolve_column(rt, kinds={"dimension", "time_dimension"})
            if dim is not None:
                dt, dcol = dim
                # a SECOND fully-resolved fact on the measure side would
                # be silently dropped by the single-measure route below
                # ('revenue and experience by specialization') — refuse
                # loudly; only the entity-table and time-bucket groupings
                # support two measures
                mfacts = self._resolve_columns_all(
                    lt - _AVG_WORDS, kinds={"fact"}
                )
                mconsumed = (
                    frozenset().union(*(c for _, _, c in mfacts))
                    if mfacts
                    else frozenset()
                )
                if len(mfacts) >= 2 and (
                    lt - _AVG_WORDS - mconsumed <= _COUNT_WORDS
                ):
                    raise KeyError(
                        "two measures grouped by a dimension column are "
                        "not supported (use an entity table or time "
                        "bucket grouping) — refusing rather than "
                        f"dropping one: {question!r}"
                    )
                meas = self._resolve_column(lt - _AVG_WORDS, kinds={"fact"})
                if meas is not None:
                    mt, mcol = meas
                    if mt != dt:
                        self._rel_between(mt, dt)  # must be joinable
                    tabs = (mt,) if mt == dt else (mt, dt)
                    fam = (
                        "avg_measure_by_dimension"
                        if lt & _AVG_WORDS
                        else "measure_by_dimension"
                    )
                    return _check_filters(
                        TemplateRoute(fam, tabs, mcol, mt, dcol, dt,
                                      filters=filters)
                    )
                # count when the left side is fully explained by
                # count-words + the dimension's own table name
                if not (lt - _COUNT_WORDS - _table_toks(dt)):
                    return _check_filters(
                        TemplateRoute(
                            "count_by_dimension", (dt,), None, None, dcol, dt,
                            filters=filters,
                        )
                    )
                # JOINED count: the left side names a different subject
                # table related to the dimension's table ('appointments
                # by specialty' counts appointments joined to doctors,
                # grouped by doctors.specialty) — the combined-slot
                # shape a filter qualifier composes with ('scheduled
                # appointments by specialty')
                subj = self._resolve_tables(lt)
                if (
                    len(subj) == 1
                    and subj[0] != dt
                    and not (lt - _COUNT_WORDS - _table_toks(subj[0]))
                ):
                    st = subj[0]
                    self._rel_between(st, dt)  # must be joinable
                    return _check_filters(
                        TemplateRoute(
                            "count_by_dimension", (st, dt), None, None,
                            dcol, dt, filters=filters,
                        )
                    )
            elif len(rt & _BUCKET_WORDS) == 1:
                bucket = next(iter(rt & _BUCKET_WORDS))
                # by-side tokens beyond the grain must be explained by
                # the subject itself ('billed amount by month for
                # completed appointments' leaves 'appointments' after
                # the filter slot ate 'completed') — anything else is a
                # qualifier we would silently drop, so refuse below
                rest = rt - _BUCKET_WORDS
                # facts resolve over the count-word-INCLUSIVE token set
                # — fact names themselves contain count words
                # ('total_charge'), so excluding them first would hide
                # a fact from the two-measure scan and silently drop
                # its companion ask (r10 review)
                bfacts = self._resolve_columns_all(
                    lt - _AVG_WORDS, kinds={"fact"}
                )
                bconsumed = (
                    frozenset().union(*(c for _, _, c in bfacts))
                    if bfacts
                    else frozenset()
                )
                # rem = ask tokens no fact explains; count words inside
                # it signal a COUNT measure, table tokens its target
                rem = lt - _AVG_WORDS - bconsumed
                # TWO-MEASURE time bucket (r10, verdict task 7): two
                # fact columns ('revenue and experience by month'), or
                # one fact + a count word + the fact table's name
                # ('revenue and visit count / total visits / how many
                # visits by month' — COUNT(*) of the fact's own table
                # is the second measure). The table-token requirement
                # separates a real count ask from a count word merely
                # modifying the measure ('total revenue by month' stays
                # single-measure). Ambiguous qualifiers (avg words,
                # thresholds, date ranges) refuse exactly like the
                # entity two-measure family; two facts whose anchor
                # tables disagree on the time dimension refuse ('by
                # month' would bucket each on a DIFFERENT event time
                # without saying so).
                two_facts = len(bfacts) == 2 and rem <= _COUNT_WORDS
                count_second = (
                    len(bfacts) == 1
                    and bool(rem & _COUNT_WORDS)
                    and bool(rem - _COUNT_WORDS)
                    and not (
                        rem - _COUNT_WORDS - _table_toks(bfacts[0][0])
                    )
                )
                if two_facts or count_second:
                    # a date range is FINE here (it filters the shared
                    # time axis — _check_filters anchors it on every
                    # table); a threshold stays ambiguous (which
                    # measure does 'over 1000' bind?) and refuses
                    if having is not None:
                        raise KeyError(
                            "a threshold qualifier is "
                            "ambiguous over two measures — refusing "
                            f"rather than guessing: {question!r}"
                        )
                    if lt & _AVG_WORDS:
                        raise KeyError(
                            "avg-words are ambiguous over two measures "
                            f"— refusing: {question!r}"
                        )
                    if two_facts:
                        (m1t, m1c, c1), (m2t, m2c, c2) = bfacts
                        # ADVICE r9: same column name => identical
                        # total_<col> output aliases; same consumed
                        # tokens => one ask-word matched two tables'
                        # columns — a single AMBIGUOUS measure, not two
                        if m1c == m2c or c1 == c2:
                            raise KeyError(
                                "the two resolved measures collide "
                                f"({m1t}.{m1c} vs {m2t}.{m2c}) — "
                                f"ambiguous, refusing: {question!r}"
                            )
                        td1 = _first_time_dim(m1t)  # KeyError -> refuse
                        if m1t != m2t and td1 != _first_time_dim(m2t):
                            raise KeyError(
                                "the two measures' anchor tables "
                                "disagree on the time dimension "
                                f"({m1t}.{td1} vs {m2t}."
                                f"{_first_time_dim(m2t)}) — 'by "
                                f"{bucket}' is ambiguous, refusing: "
                                f"{question!r}"
                            )
                        if rest - _table_toks(m1t) - _table_toks(m2t):
                            raise KeyError(
                                f"unexplained tokens in the by-clause: "
                                f"{question!r}"
                            )
                        return _check_filters(
                            TemplateRoute(
                                "two_measures_by_time_bucket",
                                tuple(sorted({m1t, m2t})),
                                m1c, m1t, td1, m1t,
                                filters=filters, bucket=bucket,
                                measure2=m2c, measure2_table=m2t,
                            )
                        )
                    mt, mcol, _ = bfacts[0]
                    if not (rest - _table_toks(mt)):
                        return _check_filters(
                            TemplateRoute(
                                "two_measures_by_time_bucket", (mt,),
                                mcol, mt, _first_time_dim(mt), mt,
                                filters=filters, bucket=bucket,
                                measure2=None, measure2_table=mt,
                            )
                        )
                meas = self._resolve_column(lt - _AVG_WORDS, kinds={"fact"})
                if meas is not None:
                    mt, mcol = meas
                    # left-side tokens beyond avg/count words, the
                    # measure's own name tokens, and the measure table's
                    # name are qualifiers the route would silently drop
                    # — fall through to refusal instead
                    mtoks = set().union(
                        set(),
                        *(
                            _toks(cand)
                            for c in self.tables[mt].columns
                            if c.name == mcol
                            for cand in (c.name, *c.synonyms)
                            if _toks(cand) <= (lt - _AVG_WORDS)
                        ),
                    )
                    leftover = (
                        lt - _AVG_WORDS - _COUNT_WORDS - mtoks
                        - _table_toks(mt)
                    )
                    if not leftover and not (rest - _table_toks(mt)):
                        fam = (
                            "avg_measure_by_time_bucket"
                            if lt & _AVG_WORDS
                            else "measure_by_time_bucket"
                        )
                        return _check_filters(
                            TemplateRoute(
                                fam, (mt,), mcol, mt, _first_time_dim(mt), mt,
                                filters=filters, bucket=bucket,
                            )
                        )
                subj = self._resolve_tables(lt)
                if (
                    len(subj) == 1
                    and not (lt - _COUNT_WORDS - _table_toks(subj[0]))
                    and not (rest - _table_toks(subj[0]))
                ):
                    t = subj[0]
                    return _check_filters(
                        TemplateRoute(
                            "count_by_time_bucket", (t,), None, None,
                            _first_time_dim(t), t,
                            filters=filters, bucket=bucket,
                        )
                    )
            else:
                # inverse grammar: 'top N <dimension> by <measure>'
                top = re.search(r"\btop\s+(\d+)\b", q[: m.start()])
                meas = self._resolve_column(rt, kinds={"fact"})
                if top and meas is not None:
                    dim = self._resolve_column(
                        lt - {"top"}, kinds={"dimension", "time_dimension"}
                    )
                    if dim is not None:
                        dt, dcol = dim
                        mt, mcol = meas
                        if mt != dt:
                            self._rel_between(mt, dt)
                        tabs = (mt,) if mt == dt else (mt, dt)
                        return _check_filters(
                            TemplateRoute(
                                "top_dimension_by_measure", tabs, mcol, mt,
                                dcol, dt, limit=int(top.group(1)),
                                filters=filters,
                            )
                        )
                    # 'top N <entity table> by <measure>' ('top 5
                    # doctors by revenue'): group the measure on its
                    # declared FK to the named table — the top-N slot
                    # composed with the r7 FK-entity grouping. The
                    # catalog cannot express LIMIT, so the template
                    # fires even without a filter qualifier.
                    gtabs = self._resolve_tables(lt - {"top"})
                    if len(gtabs) == 1 and not (
                        lt - {"top"} - _table_toks(gtabs[0])
                    ):
                        gt = gtabs[0]
                        mt, mcol = meas
                        if mt != gt:
                            ak, _bk = self._rel_between(mt, gt)
                            return _check_filters(
                                TemplateRoute(
                                    "top_dimension_by_measure", (mt,), mcol,
                                    mt, ak, mt, limit=int(top.group(1)),
                                    filters=filters,
                                )
                            )
                # 'by <table>': group the subject on its declared FK to
                # that table ('completed appointments by doctor').
                # Gated on a FILTER being present: an enum qualifier is
                # semantics the blessed catalog cannot express, so the
                # template must win — while an UNqualified entity
                # question ('billed amount per physician') is exactly
                # what the catalog covers, and falls through to the
                # verified router (the catalog-first contract the r5
                # routing tests pin).
                # (a top-N, threshold, or date-range slot also unlocks
                # the branch: LIMIT/HAVING/date-WHERE are inexpressible
                # in the blessed catalog, same rationale as the filter
                # gate)
                group_tabs = self._resolve_tables(rt)
                # TWO-measure entity grouping ('revenue and experience
                # by doctor' — the r8 'two-measure ask refuses' gap):
                # exactly two DISTINCT fact columns resolve and together
                # with the entity explain every token. Each measure
                # aggregates in its own table; the per-entity aggregates
                # full-outer join on the entity key at run time. A
                # two-measure ask is inexpressible in the blessed
                # catalog, so the template fires ungated; a threshold /
                # date-range qualifier has an AMBIGUOUS target here and
                # refuses rather than guessing which measure it binds.
                if len(group_tabs) == 1 and not (
                    rt - _table_toks(group_tabs[0])
                ):
                    facts = self._resolve_columns_all(
                        lt - _AVG_WORDS - {"top"}, kinds={"fact"}
                    )
                    consumed = frozenset().union(
                        *(c for _, _, c in facts)
                    ) if facts else frozenset()
                    if (
                        len(facts) == 2
                        and not (lt - _AVG_WORDS - {"top"} - consumed)
                    ):
                        if having is not None:
                            raise KeyError(
                                "a threshold qualifier is "
                                "ambiguous over two measures — refusing "
                                f"rather than guessing: {question!r}"
                            )
                        if lt & _AVG_WORDS:
                            raise KeyError(
                                "avg-words are ambiguous over two "
                                f"measures — refusing: {question!r}"
                            )
                        gt = group_tabs[0]
                        (m1t, m1c, c1), (m2t, m2c, c2) = facts
                        # ADVICE r9: two tables declaring a fact under
                        # the same name/synonym tokens make a SINGLE
                        # ask-word resolve as "two measures" — and the
                        # same column name would alias both outputs
                        # total_<col>. Either collision is one ambiguous
                        # measure, not two: refuse.
                        if m1c == m2c or c1 == c2:
                            raise KeyError(
                                "the two resolved measures collide "
                                f"({m1t}.{m1c} vs {m2t}.{m2c}) — "
                                f"ambiguous, refusing: {question!r}"
                            )
                        for mt in (m1t, m2t):
                            if mt != gt:
                                self._rel_between(mt, gt)  # joinable
                        # tables = what run_template actually READS (the
                        # measure tables; the entity contributes only
                        # its key NAME via each side's FK) — so a filter
                        # on an unread entity table refuses in
                        # _check_filters instead of silently not
                        # applying
                        return _check_filters(
                            TemplateRoute(
                                "two_measures_by_entity",
                                tuple(sorted({m1t, m2t})),
                                m1c, m1t,
                                self.tables[gt].primary_key, gt,
                                filters=filters,
                                measure2=m2c, measure2_table=m2t,
                            )
                        )
                if (
                    (filters or top or having or date_range)
                    and len(group_tabs) == 1
                    and not (rt - _table_toks(group_tabs[0]))
                ):
                    gt = group_tabs[0]
                    meas = self._resolve_column(
                        lt - _AVG_WORDS - {"top"}, kinds={"fact"}
                    )
                    if meas is not None:
                        mt, mcol = meas
                        ak, _bk = self._rel_between(mt, gt)
                        if top:
                            return _check_filters(
                                TemplateRoute(
                                    "top_dimension_by_measure", (mt,), mcol,
                                    mt, ak, mt, limit=int(top.group(1)),
                                    filters=filters,
                                )
                            )
                        fam = (
                            "avg_measure_by_dimension"
                            if lt & _AVG_WORDS
                            else "measure_by_dimension"
                        )
                        return _check_filters(
                            TemplateRoute(fam, (mt,), mcol, mt, ak, mt,
                                          filters=filters)
                        )
                    subj = self._resolve_tables(lt)
                    if len(subj) == 1 and subj[0] != gt and not (
                        lt - _COUNT_WORDS - _table_toks(subj[0])
                    ):
                        st = subj[0]
                        ak, _bk = self._rel_between(st, gt)
                        return _check_filters(
                            TemplateRoute(
                                "count_by_dimension", (st,), None, None,
                                ak, st, filters=filters,
                            )
                        )
        # 'having'/'whose' introduce the threshold phrase; they are not
        # stopwords (blessed-question token sets must not change), so
        # consume them locally when the slot fired
        qt = _toks(q) - ftoks - ({"having", "whose"} if having else set())
        if having is not None:
            # no-by-clause entity+measure grouping ('doctors with
            # revenue over 1000'): group the measure on its declared FK
            # to the named entity table, threshold on the aggregate.
            # Precision gate: the entity, the measure's name tokens and
            # count/avg words must explain EVERY remaining token.
            meas = self._resolve_column(
                qt - _AVG_WORDS - _COUNT_WORDS, kinds={"fact"}
            )
            tabs = self._resolve_tables(qt)
            if meas is not None and len(tabs) == 1:
                mt, mcol = meas
                gt = tabs[0]
                mtoks = set().union(
                    *(
                        _toks(cand)
                        for c in self.tables[mt].columns
                        if c.name == mcol
                        for cand in (c.name, *c.synonyms)
                        if _toks(cand) <= qt
                    )
                )
                leftover = (
                    qt - _AVG_WORDS - _COUNT_WORDS - _table_toks(gt) - mtoks
                )
                if mt != gt and not leftover:
                    ak, _bk = self._rel_between(mt, gt)
                    fam = (
                        "avg_measure_by_dimension"
                        if qt & _AVG_WORDS
                        else "measure_by_dimension"
                    )
                    return _check_filters(
                        TemplateRoute(fam, (mt,), mcol, mt, ak, mt,
                                      filters=filters)
                    )
        if qt & _COUNT_WORDS:
            tabs = self._resolve_tables(qt)
            if len(tabs) == 1:
                leftover = qt - _COUNT_WORDS - _table_toks(tabs[0])
                if not leftover:
                    return _check_filters(
                        TemplateRoute("count_table", (tabs[0],), filters=filters)
                    )
        raise KeyError(f"no query template matches {question!r}")

    def _match_enum_filters(self, question_lc: str) -> list[tuple]:
        """(table, column, value) for every declared CHECK-enum value
        whose phrase ('follow_up' -> 'follow up') appears word-bounded
        in the question. Declared values ONLY — free text never becomes
        a filter. Deterministic order (table, column, value)."""
        import re

        out = []
        for tname in sorted(self.tables):
            for c in self.tables[tname].columns:
                for v in sorted(c.values):
                    phrase = re.escape(v.replace("_", " "))
                    if re.search(rf"\b{phrase}\b", question_lc):
                        out.append((tname, c.name, v))
        return out

    def run_template(
        self, route: TemplateRoute, spark: SparkSession, dfs: dict[str, DataFrame]
    ) -> DataFrame:
        """Execute a TemplateRoute over raw replica DataFrames (templates
        apply the soft-delete filter themselves, like verified queries).
        Dimension sides broadcast; facts aggregate map-side first."""

        def live(t: str) -> DataFrame:
            df = dfs[t]
            if schemas.META_DELETED in df.columns:
                df = df.filter(~F.col(schemas.META_DELETED))
            for ft, fc, fv in route.filters:
                if ft == t:
                    df = df.filter(F.col(fc) == F.lit(fv))
            # anchor '*' = every table the route reads (two-measure
            # families, where the range filters the shared time axis)
            if route.date_range is not None and route.date_range[0] in (t, "*"):
                _, c, lo, hi = route.date_range
                d = F.to_date(F.col(c))
                df = df.filter(
                    (d >= F.lit(lo).cast("date")) & (d <= F.lit(hi).cast("date"))
                )
            return df

        def having(df: DataFrame, colname: str) -> DataFrame:
            """The measure-threshold slot: a post-aggregation filter on
            the named output column (the HAVING clause)."""
            if route.having is None:
                return df
            op, v = route.having
            c = F.col(colname)
            return df.filter(
                {"<": c < v, "<=": c <= v, ">": c > v, ">=": c >= v}[op]
            )

        def _bucket_col(time_dim: str):
            # F.trunc returns DATE for every supported grain except
            # 'day' (identity there) — DATE output stays process-TZ-
            # independent, unlike a raw date_trunc timestamp
            src = F.col(time_dim)
            return (
                F.to_date(src)
                if route.bucket == "day"
                else F.trunc(src, route.bucket)
            )

        if route.family == "two_measures_by_time_bucket":
            m1t, m1c = route.measure_table, route.measure
            m2t, m2c = route.measure2_table, route.measure2
            agg2 = (
                F.count("*").alias("n")
                if m2c is None
                else F.sum(m2c).alias(f"total_{m2c}")
            )
            if m2t == m1t:
                out = (
                    live(m1t)
                    .groupBy(_bucket_col(route.dimension).alias(route.bucket))
                    .agg(F.sum(m1c).alias(f"total_{m1c}"), agg2)
                )
            else:
                # each measure buckets ITS OWN table on the (same-named,
                # router-enforced) time dimension; per-bucket aggregates
                # are bucket-cardinality (tiny) — full outer keeps
                # buckets present on either side
                s1 = (
                    live(m1t)
                    .groupBy(_bucket_col(route.dimension).alias(route.bucket))
                    .agg(F.sum(m1c).alias(f"total_{m1c}"))
                )
                s2 = (
                    live(m2t)
                    .groupBy(_bucket_col(route.dimension).alias(route.bucket))
                    .agg(agg2)
                )
                out = s1.join(s2, route.bucket, "full_outer")
            return out.orderBy(route.bucket)

        if route.family in (
            "count_by_time_bucket",
            "measure_by_time_bucket",
            "avg_measure_by_time_bucket",
        ):
            t = route.dimension_table
            bucket_col = _bucket_col(route.dimension)
            grouped = live(t).groupBy(bucket_col.alias(route.bucket))
            if route.family == "count_by_time_bucket":
                out = having(grouped.agg(F.count("*").alias("n")), "n")
            else:
                fn = (
                    F.avg
                    if route.family == "avg_measure_by_time_bucket"
                    else F.sum
                )
                prefix = (
                    "avg" if route.family == "avg_measure_by_time_bucket"
                    else "total"
                )
                name = f"{prefix}_{route.measure}"
                out = having(grouped.agg(fn(route.measure).alias(name)), name)
            return out.orderBy(route.bucket)

        if route.family == "count_table":
            t = route.tables[0]
            return having(
                live(t).agg(F.count("*").alias(f"total_{t}")), f"total_{t}"
            )
        if route.family == "count_by_dimension":
            subject, dt = route.tables[0], route.dimension_table
            if subject != dt:
                # joined count: count SUBJECT rows grouped by a
                # dimension on the related entity table (broadcast the
                # dimension side — entity tables are the small side)
                ak, bk = self._rel_between(subject, dt)
                s_side, d_side = live(subject).alias("m"), live(dt).alias("d")
                return having(
                    s_side.join(
                        F.broadcast(d_side), F.col(f"m.{ak}") == F.col(f"d.{bk}")
                    )
                    .groupBy(
                        F.col(f"d.{route.dimension}").alias(route.dimension)
                    )
                    .agg(F.count("*").alias("n")),
                    "n",
                ).orderBy(F.col("n").desc(), route.dimension)
            return having(
                live(route.dimension_table)
                .groupBy(route.dimension)
                .agg(F.count("*").alias("n")),
                "n",
            ).orderBy(F.col("n").desc(), route.dimension)
        if route.family == "two_measures_by_entity":
            gt, key_out = route.dimension_table, route.dimension
            sides = []
            for mt, mcol in (
                (route.measure_table, route.measure),
                (route.measure2_table, route.measure2),
            ):
                k = (
                    self.tables[gt].primary_key
                    if mt == gt
                    else self._rel_between(mt, gt)[0]
                )
                sides.append(
                    live(mt)
                    .groupBy(F.col(k).alias(key_out))
                    .agg(F.sum(mcol).alias(f"total_{mcol}"))
                )
            # per-entity aggregates are entity-cardinality (tiny) —
            # full outer keeps entities present on either side
            return sides[0].join(sides[1], key_out, "full_outer").orderBy(
                key_out
            )

        mt, dt = route.measure_table, route.dimension_table
        is_avg = route.family == "avg_measure_by_dimension"
        agg_fn = F.avg if is_avg else F.sum
        out_measure = f"{'avg' if is_avg else 'total'}_{route.measure}"
        if mt == dt:
            grouped = live(mt).groupBy(route.dimension).agg(
                agg_fn(route.measure).alias(out_measure)
            )
        else:
            ak, bk = self._rel_between(mt, dt)
            m_side = live(mt).alias("m")
            d_side = live(dt).alias("d")
            grouped = (
                m_side.join(
                    F.broadcast(d_side), F.col(f"m.{ak}") == F.col(f"d.{bk}")
                )
                .groupBy(F.col(f"d.{route.dimension}").alias(route.dimension))
                .agg(agg_fn(F.col(f"m.{route.measure}")).alias(out_measure))
            )
        out = having(grouped, out_measure).orderBy(
            F.col(out_measure).desc_nulls_last(), route.dimension
        )
        if route.family == "top_dimension_by_measure":
            out = out.limit(route.limit)
        return out

    def route(self, question: str, as_of=None):
        """Full routing decision: ('verified', name) or
        ('template', TemplateRoute). ``as_of`` (ISO string or
        ``datetime.date``) pins the resolution point for relative date
        phrases; without it they refuse — except fully ABSOLUTE forms
        (year-explicit months, before/until of an ISO or year-explicit
        bound), which bind with or without an as_of (r11).

        Precedence: (1) a verbatim match to a blessed question (same
        normalized content-token set) routes to the VERIFIED catalog —
        the documented "verified catalog first" contract holds for
        questions the catalog literally covers, and ``explain_route``
        audits them as the catalog entry, not a coincidentally-
        equivalent template. Equality is on RAW tokens, no synonym
        expansion — expansion groups overlap ('appointment status'
        links status to appointments) and would swallow genuinely
        different questions.
        (2) Otherwise templates, which are PRECISION-gated — they fire
        only when every referenced object resolves exactly (a ``by
        <dimension>`` clause naming a real column, or a count question
        fully explained by one table) — so a resolved template outranks
        loose lexical similarity to a verified question (which happily
        matches 'how many patients' to an appointments count).
        (3) The similarity-gated verified catalog catches the
        paraphrases templates cannot parse. Raises KeyError when none
        clears its bar — refuse, never guess."""
        q = _toks(question)
        for name in sorted(self._verified):
            if q and q == _toks(self._verified[name][0]):
                return ("verified", name)
        try:
            return ("template", self.route_template(question, as_of=as_of))
        except KeyError:
            import re

            # a threshold/date-range qualifier no template could bind
            # must NOT fall through to the similarity-matched catalog:
            # a blessed query cannot express it, so the answer would
            # silently drop the qualifier — refuse instead. The LOOSE
            # detectors also catch qualifiers the strict slot regexes
            # rejected as malformed ('over 1,000', 'above 2024-01-01')
            ql = question.lower()
            if re.search(_RANGE_DETECT, ql) or re.search(_THRESH_DETECT, ql):
                raise KeyError(
                    "question carries a threshold/date-range qualifier "
                    "no template can bind — refusing rather than "
                    f"dropping it: {question!r}"
                )
            # relative/named-date phrases the template could not bind
            # (no as_of pinned, or the rest of the question did not
            # parse) likewise refuse — with ONE escape: a similarity-
            # matched VERIFIED question whose own text carries the same
            # relative tokens answers the qualifier itself (the
            # reference's blessed modified-today question is exactly
            # this shape), so routing there drops nothing.
            rel_toks = frozenset().union(
                *(
                    _toks(mm.group(0))
                    for mm in re.finditer(_REL_DETECT, ql)
                ),
                frozenset(),
            )
            if rel_toks:
                name = None
                # ADVICE r10: the token comparison below is DIGIT-
                # stripped, so 'last 3 months' is token-identical to
                # 'last month' and 'in may 2024' to 'in may' — a
                # blessed question carrying the digit-free phrase would
                # silently answer the WRONG window. Forms whose digits
                # carry meaning (month+year, rolling N-units) and the
                # always-refuse words never take the escape.
                if not re.search(_ESCAPE_BLOCK_RE, ql):
                    try:
                        name = self.route_question(question)
                    except KeyError:
                        pass
                # EVERY relative phrase must be carried by the blessed
                # question's own text — one covered phrase must not
                # smuggle a second, dropped one through the escape
                if name is not None and rel_toks <= _toks(
                    self._verified[name][0]
                ):
                    return ("verified", name)
                raise KeyError(
                    "question carries a relative/named date phrase no "
                    "template can bind"
                    + ("" if as_of is not None else " (no as_of pinned)")
                    + f" — refusing rather than dropping it: {question!r}"
                )
            return ("verified", self.route_question(question))

    def ask(
        self, question: str, spark: SparkSession, dfs: dict[str, DataFrame]
    ) -> DataFrame:
        """Route + run: the full question -> DataFrame path (verified
        catalog first, parameterized templates for the breadth beyond
        it, loud refusal when neither resolves)."""
        kind, target = self.route(question, as_of=dfs.get("_as_of_date"))
        if kind == "verified":
            return self.run_verified(target, spark, dfs)
        return self.run_template(target, spark, dfs)

    def explain_route(self, question: str, as_of=None) -> dict:
        """AUDITABLE routing decision — what an agent host logs before
        running anything: the resolved kind/target, the tables the
        answer will read (the grant surface), and for refusals the
        reason (relative dates audit as their RESOLVED ISO bounds).
        Never executes a query."""
        try:
            kind, target = self.route(question, as_of=as_of)
        except KeyError as e:
            return {"kind": "refused", "reason": str(e), "tables": []}
        if kind == "verified":
            return {
                "kind": "verified",
                "name": target,
                "question": self._verified[target][0],
                "tables": list(self.verified_tables(target)),
            }
        return {
            "kind": "template",
            "family": target.family,
            "measure": (
                f"{target.measure_table}.{target.measure}"
                if target.measure
                else None
            ),
            "measure2": (
                f"{target.measure2_table}.{target.measure2}"
                if target.measure2
                else None
            ),
            "dimension": (
                f"{target.dimension_table}.{target.dimension}"
                if target.dimension
                else None
            ),
            "limit": target.limit,
            "filters": [f"{t}.{c} = '{v}'" for t, c, v in target.filters],
            "bucket": target.bucket,
            "having": (
                f"{target.having[0]} {target.having[1]}"
                if target.having
                else None
            ),
            "date_range": (
                "{}.{} between {} and {}".format(
                    # '*' anchor = every table the route reads (the
                    # two-measure shared time axis)
                    "&".join(target.tables)
                    if target.date_range[0] == "*"
                    else target.date_range[0],
                    *target.date_range[1:],
                )
                if target.date_range
                else None
            ),
            "tables": list(target.tables),
        }

    # -- serialization -----------------------------------------------------
    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "description": self.description,
            "tables": [
                {
                    "name": t.name,
                    "primary_key": t.primary_key,
                    "synonyms": t.synonyms,
                    "description": t.description,
                    "columns": [
                        {
                            "name": c.name,
                            "kind": c.kind,
                            "synonyms": c.synonyms,
                            "description": c.description,
                            "values": c.values,
                        }
                        for c in t.columns
                    ],
                }
                for t in self.tables.values()
            ],
            "relationships": [vars(r) for r in self.relationships.values()],
            "verified_queries": [
                {
                    "name": k,
                    "question": q,
                    "tables": list(self._verified_tables[k]),
                }
                for k, (q, _) in self._verified.items()
            ],
        }

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @staticmethod
    def load_dict(d: dict) -> "SemanticModel":
        tables = [
            TableSpec(
                t["name"],
                t["primary_key"],
                [ColumnSpec(**c) for c in t["columns"]],
                t.get("synonyms", []),
                t.get("description", ""),
            )
            for t in d["tables"]
        ]
        rels = [Relationship(**r) for r in d["relationships"]]
        return SemanticModel(d["name"], tables, rels, d.get("description", ""))


def load_reference_yaml(path: str) -> SemanticModel:
    """Parse the REFERENCE's Cortex-Analyst semantic-model YAML
    (semantic-models/healthcare_cdc_semantic_model.yaml:1-649) into a
    ``SemanticModel`` — the interop path: a user can point this engine at
    the exact artifact they upload to the reference's stage.

    Mapping notes:
    - dimensions / time_dimensions / facts sections -> ColumnSpec.kind;
    - primary_key.columns are uppercased in the artifact (warehouse
      identifier folding) -> lowercased to match the source schema;
    - relationship_columns may be written fact-side-first OR dim-side-
      first in the artifact (e.g. ``visits_to_appointments`` has
      ``left_table: appointments``); the relationship NAME ``A_to_B`` is
      the normative orientation (A = many side), so sides are swapped to
      match it when needed;
    - verified_queries carry warehouse SQL, not DataFrame builders ->
      kept verbatim on ``model.reference_verified_sql`` (name -> sql);
      the executable builder twins live in ``healthcare_model()``.
    """
    import yaml  # vendored with pyspark's deps; gate anyway

    with open(path) as f:
        d = yaml.safe_load(f)

    kinds = (
        ("dimensions", "dimension"),
        ("time_dimensions", "time_dimension"),
        ("facts", "fact"),
    )
    tables = []
    for t in d.get("tables", []):
        cols = [
            ColumnSpec(
                c["name"],
                kind,
                list(c.get("synonyms") or []),
                str(c.get("description", "")).strip(),
            )
            for section, kind in kinds
            for c in t.get(section) or []
        ]
        pk_cols = (t.get("primary_key") or {}).get("columns") or []
        tables.append(
            TableSpec(
                t["name"],
                pk_cols[0].lower() if pk_cols else "",
                cols,
                list(t.get("synonyms") or []),
                str(t.get("description", "")).strip(),
            )
        )

    rels = []
    for r in d.get("relationships", []):
        name = r["name"]
        lt, rt = r["left_table"], r["right_table"]
        rc = r["relationship_columns"][0]
        lk, rk = rc["left_column"].lower(), rc["right_column"].lower()
        if "_to_" in name:
            want_left = name.split("_to_")[0]
            if lt != want_left and rt == want_left:
                lt, rt, lk, rk = rt, lt, rk, lk
        rels.append(Relationship(name, lt, rt, lk, rk))

    model = SemanticModel(d["name"], tables, rels, str(d.get("description", "")))
    model.reference_verified_sql = {
        vq["name"]: vq["sql"] for vq in d.get("verified_queries", [])
    }
    return model


# ---------------------------------------------------------------------------
# The healthcare model (reference yaml:2-582, re-declared)
# ---------------------------------------------------------------------------


def _dim(name, *syn):
    return ColumnSpec(name, "dimension", list(syn))


def _tdim(name, *syn):
    return ColumnSpec(name, "time_dimension", list(syn))


def _fact(name, *syn):
    return ColumnSpec(name, "fact", list(syn))


def healthcare_model() -> SemanticModel:
    meta = [
        _tdim(schemas.META_INSERTED_AT, "replicated at"),
        _tdim(schemas.META_UPDATED_AT, "last synced at"),
        _dim(schemas.META_DELETED, "is deleted"),
    ]
    model = SemanticModel(
        "healthcare_cdc",
        tables=[
            TableSpec(
                "patients",
                "patient_id",
                [
                    _dim("first_name"), _dim("last_name"),
                    _tdim("date_of_birth", "dob", "birth date"),
                    _dim("phone"), _dim("email"), _dim("address"),
                    _dim("city"), _dim("state"),
                    _dim("insurance_provider", "insurer", "payer"),
                    _tdim("registration_date"),
                    _dim("patient_id"),
                    *meta,
                ],
                synonyms=["clients", "members"],
                description="Patients registered at the clinic.",
            ),
            TableSpec(
                "doctors",
                "doctor_id",
                [
                    _dim("first_name"), _dim("last_name"),
                    _dim("specialization", "specialty"),
                    _dim("department"), _dim("phone"), _dim("email"),
                    _fact("years_of_experience", "experience"),
                    _dim("accepting_new_patients"),
                    _dim("doctor_id"),
                    *meta,
                ],
                synonyms=["physicians", "providers"],
                description="Medical staff.",
            ),
            TableSpec(
                "appointments",
                "appointment_id",
                [
                    _dim("appointment_id"), _dim("patient_id"), _dim("doctor_id"),
                    _tdim("appointment_date", "visit date"),
                    _tdim("appointment_time", "time slot"),
                    ColumnSpec(
                        "status", "dimension", ["appointment status"],
                        # CHECK enum, reference sql/0.init_healthcare.sql:77
                        values=[
                            "scheduled", "confirmed", "checked_in",
                            "in_progress", "completed", "cancelled",
                            "no_show",
                        ],
                    ),
                    _dim("reason_for_visit", "reason"),
                    ColumnSpec(
                        "appointment_type", "dimension", ["type"],
                        # CHECK enum, reference sql/0.init_healthcare.sql:79
                        values=["routine", "urgent", "follow_up", "annual"],
                    ),
                    _tdim("created_at"), _tdim("updated_at"),
                    *meta,
                ],
                synonyms=["bookings", "schedule"],
                description="Scheduled/past appointments (main CDC table).",
            ),
            TableSpec(
                "visits",
                "visit_id",
                [
                    _dim("visit_id"), _dim("appointment_id"),
                    _dim("patient_id"), _dim("doctor_id"),
                    _tdim("visit_date"),
                    _tdim("visit_start_time"), _tdim("visit_end_time"),
                    _dim("diagnosis"), _dim("treatment_notes"),
                    _dim("follow_up_required"), _dim("prescription_given"),
                    _fact("total_charge", "revenue", "billed amount"),
                    *meta,
                ],
                synonyms=["encounters"],
                description="Completed clinical visits with charges.",
            ),
        ],
        relationships=[
            Relationship("appointments_to_patients", "appointments", "patients",
                         "patient_id", "patient_id"),
            Relationship("appointments_to_doctors", "appointments", "doctors",
                         "doctor_id", "doctor_id"),
            Relationship("visits_to_appointments", "visits", "appointments",
                         "appointment_id", "appointment_id"),
            Relationship("visits_to_patients", "visits", "patients",
                         "patient_id", "patient_id"),
            Relationship("visits_to_doctors", "visits", "doctors",
                         "doctor_id", "doctor_id"),
        ],
        description="CDC-replicated healthcare warehouse (4 tables).",
    )

    # -- verified queries (reference yaml:583-649) -------------------------

    @model.verified(
        "total_appointments",
        "How many appointments do we have in total?",
        tables=["appointments"],
    )
    def total_appointments(spark: SparkSession, dfs: dict[str, DataFrame]):
        # yaml:592-595: COUNT(*) WHERE NOT deleted
        return dfs["appointments"].filter(~F.col(schemas.META_DELETED)).agg(
            F.count("*").alias("total_appointments")
        )

    @model.verified(
        "appointments_modified_today",
        "How many appointments were modified via CDC today?",
        tables=["appointments"],
    )
    def modified_today(spark: SparkSession, dfs: dict[str, DataFrame]):
        # yaml:608-617: rows whose _SNOWFLAKE_UPDATED_AT falls on the
        # current day; as-of is injected for determinism.
        appts = dfs["appointments"]
        as_of = dfs.get("_as_of_date")
        day = F.lit(as_of).cast("date") if as_of else F.current_date()
        return appts.filter(
            F.col(schemas.META_UPDATED_AT).cast("date") == day
        ).agg(F.count("*").alias("appointments_modified_today"))

    @model.verified(
        "revenue_by_doctor",
        "What is the total revenue by doctor?",
        tables=["doctors", "visits"],
    )
    def revenue_by_doctor(spark: SparkSession, dfs: dict[str, DataFrame]):
        # yaml:621-648: doctors LEFT JOIN visits (not deleted), revenue
        # stats per doctor, ordered desc nulls last.
        doctors = dfs["doctors"].filter(~F.col(schemas.META_DELETED))
        visits = dfs["visits"].filter(~F.col(schemas.META_DELETED))
        v = visits.select("doctor_id", "visit_id", "total_charge").alias("v")
        d = doctors.alias("d")
        return (
            d.join(v, F.col("d.doctor_id") == F.col("v.doctor_id"), "left")
            .groupBy(
                F.col("d.doctor_id").alias("doctor_id"),
                F.concat(F.col("d.first_name"), F.lit(" "), F.col("d.last_name")).alias(
                    "doctor_name"
                ),
                F.col("d.specialization").alias("specialization"),
            )
            .agg(
                F.count("v.visit_id").alias("total_visits"),
                F.sum("v.total_charge").alias("total_revenue"),
                F.min("v.total_charge").alias("min_charge"),
                F.max("v.total_charge").alias("max_charge"),
            )
            .orderBy(F.col("total_revenue").desc_nulls_last())
        )

    return model
