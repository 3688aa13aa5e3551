"""Operator inventory (SURVEY.md §2) — importing this package registers
every query builder and its DuckDB oracle twin into the registry.

Import order IS registry order, and external harnesses may check a
prefix of it under a budget — so modules whose queries most need fresh
evidence run first (window/report/ANN families plus anything changed
this round), and operators with long green history run last."""

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators import (  # noqa: F401
    analytics_ext,
    windows,
    reports,
    similarity,
    multimodal,
    dedup,
    joins,
    projections,
    aggregations,
    cdc_audit,
    datagen,
    text,
)  # fmt: skip — listed order = registration order (see docstring)
from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.registry import (
    ORACLES,
    QUERIES,
)

# Queries whose driver-side correctness evidence is stale or missing
# run FIRST — external harnesses may verify only a prefix under a budget.
# DERIVED MECHANICALLY: python tools/evidence_window.py (rule: changed
# plan/oracle since last green row => unchecked first, then oldest
# evidence; window = 50). Do not hand-curate — edit the script's
# CHANGED_SINCE_GREEN and regenerate.
_NEEDS_EVIDENCE_FIRST = [
    "h21_regexp_extract",  # changed/new this round
    "dd1_exact_dedup",  # changed/new this round
    "dd4_minhash_lsh_pairs",  # changed/new this round
    "mm5_decoded_media_metadata",  # changed/new this round
    "sim4_knn_ivf",  # changed/new this round
    "tx10_tfidf_top_terms",  # changed/new this round
    "px6_neardup_aware_curation",  # changed/new this round
    "d26_grouping_sets",  # changed/new this round
    "h28_array_functions",  # changed/new this round
    "c12_full_outer_join",  # changed/new this round
    "e10_range_interval_frame",  # changed/new this round
    "d15_approx_sketches",  # latest green r0
    "b2_select_star",  # latest green r1
    "b3_alias_expr",  # latest green r1
    "b5_in_list",  # latest green r1
    "b6_date_range",  # latest green r1
    "b7_null_predicate",  # latest green r1
    "b8_column_inequality",  # latest green r1
    "c1_join_2way_agg",  # latest green r1
    "c5_join_derived_table",  # latest green r1
    "c6_semi_join",  # latest green r1
    "d10_rate_avg_case",  # latest green r1
    "d11_having",  # latest green r1
    "d1_global_agg",  # latest green r1
    "d2_groupby_single",  # latest green r1
    "d3_tpch_q1_pricing_summary",  # latest green r1
    "d4_groupby_expression",  # latest green r1
    "d6_count_distinct",  # latest green r1
    "d9_count_case_no_else",  # latest green r1
    "dd6_embedding_cosine_dups",  # latest green r1
    "flagship_revenue_by_nation",  # latest green r1
    "h11_timestampdiff_minute",  # latest green r1
    "h14_date_trunc_hour",  # latest green r1
    "h2_h3_round_nullif",  # latest green r1
    "mm2_media_metadata_stats",  # latest green r1
    "b10_compound_predicate",  # latest green r2
    "c8_scalar_subquery",  # latest green r2
    "c9_not_exists",  # latest green r2
    "d17_rollup",  # latest green r2
    "d18_cube",  # latest green r2
    "d19_exact_corr_moments",  # latest green r2
    "d20_order_statistics",  # latest green r2
    "d21_bool_aggregates",  # latest green r2
    "d8_conditional_sum",  # latest green r2
    "dd7_dedup_groups",  # latest green r2
    "e1_pct_of_total",  # latest green r2
    "e2_nested_agg_window",  # latest green r2
    "e3_partitioned_window",  # latest green r2
    "e4_listagg_distinct",  # latest green r2
    "e5_lag_lead",  # latest green r2
]


def _reorder_registry() -> None:
    missing = [k for k in _NEEDS_EVIDENCE_FIRST if k not in QUERIES]
    assert not missing, f"priority list names unknown queries: {missing}"
    ordered = list(_NEEDS_EVIDENCE_FIRST) + [
        k for k in QUERIES if k not in set(_NEEDS_EVIDENCE_FIRST)
    ]
    for reg in (QUERIES, ORACLES):
        tmp = {k: reg[k] for k in ordered if k in reg}
        reg.clear()
        reg.update(tmp)


_reorder_registry()

__all__ = ["QUERIES", "ORACLES"]
