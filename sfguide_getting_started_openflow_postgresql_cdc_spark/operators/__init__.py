"""Operator inventory (SURVEY.md §2) — importing this package registers
every query builder and its DuckDB oracle twin into the registry.

Import order IS registry order, and external harnesses may check a
prefix of it under a budget — so modules whose queries most need fresh
evidence run first (window/report/ANN families plus anything changed
this round), and operators with long green history run last."""

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators import (  # noqa: F401
    ann_auto,
    pq,
    analytics_ext,
    classic,
    windows,
    reports,
    similarity,
    multimodal,
    dedup,
    dedup_index,
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
# Evidence files consumed at generation time — the drift test
# re-runs the generator pinned to exactly this list, so later
# driver artifact drops cannot redden a shipped tree.
_EVIDENCE_FILES = [
    "CORRECTNESS_r01.json",
    "CORRECTNESS_r02.json",
    "CORRECTNESS_r03.json",
    "CORRECTNESS_r04.json",
    "CORRECTNESS_r05.json",
    "CORRECTNESS_r06.json",
    "CORRECTNESS_r07.json",
]
_NEEDS_EVIDENCE_FIRST = [
    "sim11_knn_graph_auto",  # changed/new this round
    "dd16_embedding_dups_auto",  # changed/new this round
    "px12_neardup_decontamination",  # changed/new this round
    "dd15_incremental_minhash_pairs",  # changed/new this round
    "px13_exact_substring_spans",  # changed/new this round
    "px14_exact_substring_decontamination",  # changed/new this round
    "c18_important_parts",  # changed/new this round
    "c19_top_supplier",  # changed/new this round
    "c20_bracketed_revenue",  # changed/new this round
    "c21_supplier_diversity",  # changed/new this round
    "c22_sole_late_supplier",  # changed/new this round
    "mm9_image_neardup_pairs",  # changed/new this round
    "c23_order_priority_check",  # changed/new this round
    "c24_local_supplier_volume",  # changed/new this round
    "c25_returned_top_customers",  # changed/new this round
    "c26_shipping_delay_priority",  # changed/new this round
    "c27_customer_order_distribution",  # changed/new this round
    "c28_shipping_priority",  # changed/new this round
    "c29_product_type_profit",  # changed/new this round
    "mm10_audio_neardup_pairs",  # changed/new this round
    "sim12_knn_pq",  # changed/new this round
    "px15_cluster_safe_split",  # changed/new this round
    "c30_min_cost_supplier",  # changed/new this round
    "c31_dominant_part_suppliers",  # changed/new this round
    "c32_forecast_revenue_change",  # changed/new this round
    "d15_approx_sketches",  # latest green r0
    "sim4_knn_ivf",  # latest green r0
    "sim8_kmeans_fit",  # latest green r0
    "b8_column_inequality",  # latest green r4
    "c12_full_outer_join",  # latest green r4
    "c1_join_2way_agg",  # latest green r4
    "c5_join_derived_table",  # latest green r4
    "c6_semi_join",  # latest green r4
    "c8_scalar_subquery",  # latest green r4
    "c9_not_exists",  # latest green r4
    "d10_rate_avg_case",  # latest green r4
    "d11_having",  # latest green r4
    "d17_rollup",  # latest green r4
    "d18_cube",  # latest green r4
    "d19_exact_corr_moments",  # latest green r4
    "d1_global_agg",  # latest green r4
    "d20_order_statistics",  # latest green r4
    "d21_bool_aggregates",  # latest green r4
    "d26_grouping_sets",  # latest green r4
    "d2_groupby_single",  # latest green r4
    "d3_tpch_q1_pricing_summary",  # latest green r4
    "d4_groupby_expression",  # latest green r4
    "d6_count_distinct",  # latest green r4
    "d8_conditional_sum",  # latest green r4
    "d9_count_case_no_else",  # latest green r4
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
