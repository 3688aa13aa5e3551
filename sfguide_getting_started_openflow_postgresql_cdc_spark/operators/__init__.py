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
    "CORRECTNESS_r08.json",
    "CORRECTNESS_r09.json",
    "CORRECTNESS_r10.json",
    "CORRECTNESS_r11.json",
]
_NEEDS_EVIDENCE_FIRST = [
    "sim12_knn_pq",  # changed/new this round
    "dd3_ngram_jaccard_pairs",  # changed/new this round
    "dd4_minhash_lsh_pairs",  # changed/new this round
    "dd7_dedup_groups",  # changed/new this round
    "dd10_containment_pairs",  # changed/new this round
    "dd11_softdedup_weights",  # changed/new this round
    "dd13_cluster_size_histogram",  # changed/new this round
    "dd15_incremental_minhash_pairs",  # changed/new this round
    "dd16_embedding_dups_auto",  # changed/new this round
    "px6_neardup_aware_curation",  # changed/new this round
    "px8_ngram_decontamination",  # changed/new this round
    "px11_training_manifest",  # changed/new this round
    "px12_neardup_decontamination",  # changed/new this round
    "px15_cluster_safe_split",  # changed/new this round
    "px16_incremental_manifest",  # changed/new this round
    "px17_incremental_lang_stats",  # changed/new this round
    "px18_incremental_source_stats",  # changed/new this round
    "sim11_knn_graph_auto",  # changed/new this round
    "d15_approx_sketches",  # latest green r0
    "sim4_knn_ivf",  # latest green r0
    "sim8_kmeans_fit",  # latest green r0
    "px10_source_mixture_weights",  # latest green r6
    "sim10_knn_graph_scaled",  # latest green r6
    "sim6_knn_graph",  # latest green r6
    "sim7_kmeans_assign",  # latest green r6
    "sim9_contrastive_pairs",  # latest green r6
    "b10_compound_predicate",  # latest green r7
    "b2_select_star",  # latest green r7
    "b3_alias_expr",  # latest green r7
    "b5_in_list",  # latest green r7
    "b6_date_range",  # latest green r7
    "b7_null_predicate",  # latest green r7
    "c12_small_qty_revenue",  # latest green r7
    "c13_large_volume_customers",  # latest green r7
    "c14_nation_trade_flows",  # latest green r7
    "c15_market_share",  # latest green r7
    "c16_dormant_high_balance",  # latest green r7
    "c17_promo_revenue_share",  # latest green r7
    "d29_modern_aggregates",  # latest green r7
    "dd5_simhash",  # latest green r7
    "dd6_embedding_cosine_dups_scaled",  # latest green r7
    "i15_state_islands",  # latest green r7
    "i5_tumbling_window_agg",  # latest green r7
    "i8_change_volume",  # latest green r7
    "i8_recent_changes",  # latest green r7
    "i9_sessionization",  # latest green r7
    "mm1_media_features",  # latest green r7
    "mm2_media_metadata_stats",  # latest green r7
    "mm3_frame_sample",  # latest green r7
    "mm4_binary_metadata",  # latest green r7
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
