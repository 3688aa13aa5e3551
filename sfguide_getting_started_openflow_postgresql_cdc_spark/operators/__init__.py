"""Operator inventory (SURVEY.md §2) — importing this package registers
every query builder and its DuckDB oracle twin into the registry.

Import order IS registry order, and external harnesses may check a
prefix of it under a budget — so modules whose queries most need fresh
evidence run first (window/report/ANN families plus anything changed
this round), and operators with long green history run last."""

from sfguide_getting_started_openflow_postgresql_cdc_spark.operators import (  # noqa: F401
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
]

_NEEDS_EVIDENCE_FIRST = [
    "d29_modern_aggregates",  # changed/new this round
    "i15_state_islands",  # changed/new this round
    "dd15_incremental_minhash_pairs",  # changed/new this round
    "c12_small_qty_revenue",  # changed/new this round
    "c13_large_volume_customers",  # changed/new this round
    "c14_nation_trade_flows",  # changed/new this round
    "c15_market_share",  # changed/new this round
    "c16_dormant_high_balance",  # changed/new this round
    "c17_promo_revenue_share",  # changed/new this round
    "px12_neardup_decontamination",  # changed/new this round
    "dd6_embedding_cosine_dups_scaled",  # changed/new this round
    "dd4_minhash_lsh_pairs",  # changed/new this round
    "dd3_ngram_jaccard_pairs",  # changed/new this round
    "dd5_simhash",  # changed/new this round
    "dd9_crossdoc_ngram_stats",  # changed/new this round
    "tx10_tfidf_top_terms",  # changed/new this round
    "mm1_media_features",  # changed/new this round
    "mm2_media_metadata_stats",  # changed/new this round
    "mm3_frame_sample",  # changed/new this round
    "mm8_image_dup_groups",  # changed/new this round
    "mm5_decoded_media_metadata",  # changed/new this round
    "mm6_image_ahash",  # changed/new this round
    "mm7_audio_frame_energy",  # changed/new this round
    "d15_approx_sketches",  # latest green r0
    "sim4_knn_ivf",  # latest green r0
    "sim8_kmeans_fit",  # latest green r0
    "i5_tumbling_window_agg",  # latest green r3
    "i8_change_volume",  # latest green r3
    "i8_recent_changes",  # latest green r3
    "i9_sessionization",  # latest green r3
    "mm4_binary_metadata",  # latest green r3
    "px2_hash_split",  # latest green r3
    "px3_stratified_sample",  # latest green r3
    "px4_contamination_check",  # latest green r3
    "px5_shard_packing",  # latest green r3
    "sim1_knn_cosine_bruteforce",  # latest green r3
    "sim2_knn_lsh_bucketed",  # latest green r3
    "tx1_token_count",  # latest green r3
    "tx2_quality_score",  # latest green r3
    "tx3_language_guess",  # latest green r3
    "tx4_fingerprint",  # latest green r3
    "tx5_chunk_documents",  # latest green r3
    "tx8_word_bigrams",  # latest green r3
    "tx9_stopword_profile",  # latest green r3
    "b10_compound_predicate",  # latest green r4
    "b2_select_star",  # latest green r4
    "b3_alias_expr",  # latest green r4
    "b5_in_list",  # latest green r4
    "b6_date_range",  # latest green r4
    "b7_null_predicate",  # latest green r4
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
