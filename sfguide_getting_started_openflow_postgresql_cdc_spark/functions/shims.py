"""Snowflake/PostgreSQL <-> Spark function-semantics shims (SURVEY.md §2.H).

The reference's analytics SQL leans on a handful of functions whose
semantics differ between Snowflake and Spark. Each shim is a pure
Column->Column function — Catalyst folds them into whole-stage codegen,
so there is zero UDF overhead.

Also home to the engine-wide numeric-determinism policy: floating-point
SUM/AVG are order-dependent, and at 100 TB the accumulation order is
never reproducible across runs or engines. Monetary aggregates therefore
route through ``DecimalType`` (exact, associative) via ``decimal_sum`` /
``decimal_avg``; only final ratios drop back to double (IEEE division of
exact operands is itself deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Decimal wide enough for 100 TB-scale sums of 4-decimal measures:
# 38 total digits = ~1e34 integral headroom.
_SUM_DECIMAL = "decimal(38,4)"


def decimal_sum(col: Column | str) -> Column:
    """Order-independent SUM for double measures: cast each value to
    decimal(38,4) (exact, deterministic round-half-up — binary doubles
    can never sit exactly on a decimal tie) and sum exactly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_SUM_DECIMAL))


def decimal_avg(col: Column | str) -> Column:
    """Deterministic AVG: exact decimal sum, then one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return decimal_sum(c).cast("double") / F.count(c)


def pct_of(part: Column, whole: Column) -> Column:
    """``part * 100 / whole`` as double with divide-by-zero guard —
    the reference's %-of-total idiom (sql/4.analytics_queries.sql:36)."""
    return part.cast("double") * 100.0 / nullif_zero(whole.cast("double"))


def nullif_zero(col: Column) -> Column:
    """NULLIF(x, 0) — the reference's division guard
    (sql/4.analytics_queries.sql:117-118,160,177)."""
    return F.nullif(col, F.lit(0))


def sf_datediff_year(start: Column, end: Column) -> Column:
    """Snowflake ``DATEDIFF(year, start, end)`` = year(end) - year(start)
    (calendar-boundary crossings, NOT elapsed years). Used for patient age
    (sql/2.verify_snapshot.sql:191-194)."""
    return F.year(end) - F.year(start)


def sf_dayofweek(col: Column) -> Column:
    """Snowflake/PostgreSQL DAYOFWEEK: Sunday=0..Saturday=6. Spark's
    ``dayofweek`` is Sunday=1..Saturday=7 (sql/4.analytics_queries.sql:138)."""
    return F.dayofweek(col) - F.lit(1)


def sf_dayname(col: Column) -> Column:
    """Snowflake ``DAYNAME`` -> 3-letter day ('Mon')
    (sql/4.analytics_queries.sql:137)."""
    return F.date_format(col, "EEE")


def sf_timestampdiff_minute(t1: Column, t2: Column) -> Column:
    """Snowflake ``TIMESTAMPDIFF(MINUTE, t1, t2)``: counts minute-BOUNDARY
    crossings (truncate both to the minute, then diff), not elapsed
    seconds // 60 — for t1=10:00:50, t2=10:01:10 the answer is 1, not 0
    (sql/4.analytics_queries.sql:53-55).

    floor() handles negative spans correctly (floor division pairs with
    boundary counting in both directions). ``unix_timestamp`` on NTZ input
    is session-TZ-dependent, so the engine pins
    ``spark.sql.session.timeZone=UTC`` (session.py / loader.py).
    """
    return F.floor(F.unix_timestamp(t2) / 60) - F.floor(F.unix_timestamp(t1) / 60)


def listagg_distinct_ordered(col: Column | str, sep: str = ", ") -> Column:
    """Snowflake ``LISTAGG(DISTINCT x, sep) WITHIN GROUP (ORDER BY x)``
    (sql/4.analytics_queries.sql:37): distinct values, sorted, joined.

    Spark-first composition: collect_set (partial-aggregated map-side) ->
    array_sort -> array_join; no UDF, stays in codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_sort(F.collect_set(c)), sep)


def to_time_string(hour: Column, minute: Column, second: Column) -> Column:
    """Compose the engine's TIME representation ('HH:mm:ss' string —
    Spark has no TIME type; lexical order == time order)."""
    return F.concat_ws(
        ":",
        F.lpad(hour.cast("string"), 2, "0"),
        F.lpad(minute.cast("string"), 2, "0"),
        F.lpad(second.cast("string"), 2, "0"),
    )


def time_to_seconds(col: Column | str) -> Column:
    """'HH:mm:ss' TIME string -> integer seconds since midnight — the
    accessor that makes the engine's string TIME representation
    (reference sql/0.init_healthcare.sql:76 TIME(9);
    semantic-models/...yaml:168) arithmetic-capable: differences,
    shifts, and bucketing become exact integer math. Pure split/cast,
    stays in codegen."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ":")
    return (
        parts.getItem(0).cast("long") * 3600
        + parts.getItem(1).cast("long") * 60
        + parts.getItem(2).cast("long")
    )


def seconds_to_time(col: Column) -> Column:
    """Integer seconds-since-midnight -> 'HH:mm:ss' TIME string (inverse
    of :func:`time_to_seconds`; caller wraps around midnight with
    ``% 86400`` where that is the intended semantic)."""
    return to_time_string(
        F.floor(col / 3600).cast("int"),
        F.floor(col % 3600 / 60).cast("int"),
        (col % 60).cast("int"),
    )
