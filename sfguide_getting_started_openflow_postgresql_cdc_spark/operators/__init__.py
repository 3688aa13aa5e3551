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
# (never checked / failed / changed / added since the last checked round)
# run FIRST — external harnesses may verify only a prefix under a budget.
# Keep this list at <= 50 entries and refresh it each round from the
# latest CORRECTNESS_r{N}.json.
_NEEDS_EVIDENCE_FIRST = [
    # added this round
    "e5_lag_lead", "e6_moving_frame", "e7_rank_functions", "e8_running_total",
    "d17_rollup", "d18_cube", "d19_exact_corr_moments",
    "c8_scalar_subquery", "c9_not_exists", "g3_intersect", "g4_except",
    "h20_like_patterns", "h21_regexp_extract",
    "px2_hash_split", "px3_stratified_sample", "sim5_range_search",
    # failed or errored in round 1 (both reworked)
    "d8_conditional_sum", "mm1_media_features",
    # never driver-checked in round 1
    "sim1_knn_cosine_bruteforce", "sim2_knn_lsh_bucketed",
    "sim3_pairwise_label_centroids",
    "e1_pct_of_total", "e2_nested_agg_window", "e3_partitioned_window",
    "e4_listagg_distinct", "f4_topk_global", "f6_topk_per_group",
    "g1_union_all_rowcounts", "g2_data_quality_nulls",
    "b10_compound_predicate", "h1_string_concat", "h4_case_bucket",
    "h5_simple_case", "h13_compose_timestamp", "h6_cast_to_date",
    "h8_date_arithmetic", "h12_to_char_month", "h15_dayname_dayofweek",
    "h16_modulo",
    # added in round 2 before this session
    "mm3_frame_sample", "dd7_dedup_groups", "i10_asof_join",
    "i11_range_join", "px1_corpus_curation", "tx6_bpe_token_count",
    "tx7_vocab_topk",
    # rows-only sim4/d15 ride outside the window (their weaker check
    # carries the least information per slot)
    # second batch added this session (c3/c4 were rewritten this round
    # too but have one green driver check on the old plan + local parity
    # on the new one — never-checked queries win the last slots)
    "h22_array_functions", "d20_order_statistics", "d21_bool_aggregates",
    "f7_pagination",
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
