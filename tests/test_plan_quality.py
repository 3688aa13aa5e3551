"""Whole-registry plan-quality gate: every registered query's physical
plan is checked for the three local red flags that become cluster
killers at 100 TB — CartesianProduct (unbounded pair blowup),
BatchEvalPython (row-at-a-time Python in the hot path; Arrow pandas
UDFs plan as ArrowEvalPython), and SinglePartition exchanges anywhere
but AFTER aggregation has reduced the data to group-cardinality rows
(the documented no-key-window convention)."""

import pytest

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators import QUERIES
from sfguide_getting_started_openflow_postgresql_cdc_spark.plans.inspect import (
    explain_str,
)

# queries whose SinglePartition is a no-key window / global aggregate
# over ALREADY-AGGREGATED rows (source-, status-, or corpus-cardinality
# inputs) — reviewed by hand; additions need the same review
SINGLE_PARTITION_POST_AGG = {
    "px10_source_mixture_weights",  # window over per-source aggregates
    "dd2_fingerprint_stats",        # corpus-level global aggregate
    "e1_pct_of_total",              # % of total over status aggregates
    "e2_nested_agg_window",         # window over grouped aggregates
    "g1_union_all_rowcounts",       # scalar counts unioned
    "g2_data_quality_nulls",        # scalar quality aggregate
    "d1_global_agg",                # the global aggregate itself
    "c12_small_qty_revenue",        # Q17: global revenue scalar after the
                                    # per-part join (map-side partials first)
    "i16_funnel_stages",            # crossJoin of three 1-row stage counts
    "c20_bracketed_revenue",        # Q19: global scalar after the broadcast
                                    # join (map-side partials first)
    "c32_forecast_revenue_change",  # Q6: global scalar over one pushed-
                                    # filter scan (map-side partials first)
    "c30_min_cost_supplier",        # Q2: the exchange is Catalyst's
                                    # RUNTIME BLOOM FILTER build on the
                                    # pruned part keys (partial agg of a
                                    # bounded sketch, then one merge) —
                                    # injected scan pruning, the scale-
                                    # POSITIVE behavior
    "c31_dominant_part_suppliers",  # Q20: same runtime bloom-filter
                                    # build
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_has_no_scale_red_flags(spark, sf_dir, name):
    plan = explain_str(QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF (use Arrow/pandas)"
    )
    if name not in SINGLE_PARTITION_POST_AGG:
        assert "SinglePartition" not in plan, (
            f"{name}: single-partition exchange outside the reviewed "
            "post-aggregation set"
        )
