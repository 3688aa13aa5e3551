"""Physical-plan inspection helpers — the engine's ".explain and iterate"
tooling (SURVEY.md §4).

These make scale properties ASSERTABLE in tests instead of hoped-for:
filters pushed into the parquet scan, dimension joins planned as
broadcast hash joins, top-k planned as TakeOrderedAndProject, scans
pruned to the referenced columns.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the physical plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column lists of every ReadSchema in the plan (pruning check)."""
    text = explain_str(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", text)


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df)
