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
    # -- failed in r02 (oracle dtype fixed this round: CAST SUM AS BIGINT)
    "px2_hash_split", "px3_stratified_sample",
    # -- never driver-checked in any round (r01 ∪ r02)
    "sim6_knn_graph", "dd8_semantic_dedup_groups", "px4_contamination_check",
    "px5_shard_packing", "mm4_binary_metadata", "c10_salted_skew_join",
    "c11_dense_grid_report", "i13_event_transitions", "tx8_word_bigrams",
    "tx9_stopword_profile", "h23_conditional_funcs", "h24_string_functions",
    "h25_date_parts", "h26_bit_operations", "h27_month_arithmetic",
    "d22_multi_distinct", "d23_unpivot", "d24_value_histogram",
    "d25_top_percent", "e9_distribution_windows", "g5_union_distinct",
    "sim4_knn_ivf",
    # -- plan rewritten after their only green check (r1); re-green the
    #    current plans (VERDICT r2 / ADVICE: treat plan-changed as unchecked)
    "c3_left_join_count", "c4_left_join_residual_on",
    # -- plan/semantics changed this round (dd1 fingerprint-key shuffle,
    #    dd3 hot-shingle cap, px5 integer division — px5 above already)
    "dd1_exact_dedup", "dd3_ngram_jaccard_pairs",
    # -- oldest surviving evidence (green r1 only, unchecked since)
    "dd2_fingerprint_stats", "dd4_minhash_lsh_pairs", "dd5_simhash",
    "d14_exact_percentiles", "d16_pivot", "h19_json_extract",
    "i9_sessionization", "tx1_token_count", "tx2_quality_score",
    "tx3_language_guess", "tx4_fingerprint", "tx5_chunk_documents",
    "a5_generate_series", "c7_anti_join", "i3_latest_state_per_key",
    "i5_tumbling_window_agg", "i8_change_volume", "i8_recent_changes",
    "b1_project_filter", "h10_datediff_year",
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
