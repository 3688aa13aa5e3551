"""Every registered operator must match its DuckDB oracle exactly —
the local twin of the driver's CORRECTNESS gate."""

import pytest

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators import (
    ORACLES,
    QUERIES,
)
from tests.oracle_harness import compare_query


def test_every_query_has_callable():
    assert QUERIES, "no queries registered"
    for name, fn in QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    compare_query(spark, sf_dir, name, QUERIES[name], ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    from tests.oracle_harness import empty_allowed

    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n > 0 or empty_allowed(name, sf_dir), (
        f"{name}: empty result at {sf_dir} — a rows-only driver check "
        "on an empty frame is vacuous"
    )
    assert df.schema is not None
