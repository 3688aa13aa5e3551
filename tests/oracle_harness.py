"""Local replica of the driver's correctness gate: run a registered Spark
query and its DuckDB oracle side-by-side, sort columns by name and rows by
value, and demand exact equality.

Stricter than a tolerance compare on purpose — if values are bit-identical
here, the driver's value-hash comparison cannot flake.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb

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


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("null",)
        return ("f", v)
    if isinstance(v, decimal.Decimal):
        return ("f", float(v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("ts", datetime.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_norm(x) for x in v))
    return ("s", str(v))


def rows_to_canonical(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


# Queries allowed to return an EMPTY result, per scale-factor tag —
# every other (name, sf) must be non-empty, or its oracle match is
# VACUOUS (0 rows == 0 rows proves nothing about the query logic; the
# r8 verdict caught c18 shipping exactly that, and this gate then
# caught c7). Name -> sf-dir basenames where empty is allowed. The
# entries below are similarity/threshold ops whose sf0.001 slice
# genuinely contains no qualifying pairs (embeddings are near-random
# at 500 vectors; the 50-token exact-substring quote doesn't occur);
# all are non-empty at sf0.01 — the driver's grading scale — where NO
# query may be empty.
LEGITIMATELY_EMPTY: dict = {
    "c14_nation_trade_flows": {"sf0.001"},
    "dd16_embedding_dups_auto": {"sf0.001"},
    "dd6_embedding_cosine_dups": {"sf0.001"},
    "dd6_embedding_cosine_dups_scaled": {"sf0.001"},
    "dd8_semantic_dedup_groups": {"sf0.001"},
    "px14_exact_substring_decontamination": {"sf0.001"},
}


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/"))


def empty_allowed(name: str, sf_dir: str) -> bool:
    return _sf_tag(sf_dir) in LEGITIMATELY_EMPTY.get(name, ())


def compare_query(spark, sf_dir: str, name: str, query_fn, oracle: str):
    sdf = query_fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(oracle)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    s = rows_to_canonical(spark_cols, spark_rows)
    d = rows_to_canonical(duck_cols, duck_rows)
    assert len(s) == len(d), f"{name}: row count spark={len(s)} duck={len(d)}"
    assert s or empty_allowed(name, sf_dir), (
        f"{name}: VACUOUS oracle match — both sides returned 0 rows at "
        f"{sf_dir}; re-anchor the query's thresholds to the corpus "
        "distribution or whitelist (name, sf) in LEGITIMATELY_EMPTY"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(s)} row mismatches; first 3: {mismatches[:3]}"
    )
