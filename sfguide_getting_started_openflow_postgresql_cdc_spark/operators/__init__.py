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
]
_NEEDS_EVIDENCE_FIRST = [
    "mm5_decoded_media_metadata",  # changed/new this round
    "mm6_image_ahash",  # changed/new this round
    "mm8_image_dup_groups",  # changed/new this round
    "mm9_image_neardup_pairs",  # changed/new this round
    "dd3_ngram_jaccard_pairs",  # changed/new this round
    "dd4_minhash_lsh_pairs",  # changed/new this round
    "dd7_dedup_groups",  # changed/new this round
    "dd8_semantic_dedup_groups",  # changed/new this round
    "dd9_crossdoc_ngram_stats",  # changed/new this round
    "dd10_containment_pairs",  # changed/new this round
    "dd11_softdedup_weights",  # changed/new this round
    "dd13_cluster_size_histogram",  # changed/new this round
    "dd15_incremental_minhash_pairs",  # changed/new this round
    "dd16_embedding_dups_auto",  # changed/new this round
    "px6_neardup_aware_curation",  # changed/new this round
    "px8_ngram_decontamination",  # changed/new this round
    "px9_quality_curriculum",  # changed/new this round
    "px11_training_manifest",  # changed/new this round
    "px12_neardup_decontamination",  # changed/new this round
    "px15_cluster_safe_split",  # changed/new this round
    "px16_incremental_manifest",  # changed/new this round
    "px17_incremental_lang_stats",  # changed/new this round
    "px18_incremental_source_stats",  # changed/new this round
    "tx10_tfidf_top_terms",  # changed/new this round
    "tx11_repetition_stats",  # changed/new this round
    "e11_rank_distributions",  # changed/new this round
    "sim11_knn_graph_auto",  # changed/new this round
    "sim12_knn_pq",  # changed/new this round
    "d15_approx_sketches",  # latest green r0
    "sim4_knn_ivf",  # latest green r0
    "sim8_kmeans_fit",  # latest green r0
    "e12_value_windows",  # latest green r6
    "e9_distribution_windows",  # latest green r6
    "f8_keyset_pagination",  # latest green r6
    "g5_union_distinct",  # latest green r6
    "g6_except_all",  # latest green r6
    "g7_intersect_all",  # latest green r6
    "h10_datediff_year",  # latest green r6
    "h19_json_extract",  # latest green r6
    "h23_conditional_funcs",  # latest green r6
    "h24_string_functions",  # latest green r6
    "h25_date_parts",  # latest green r6
    "h26_bit_operations",  # latest green r6
    "h27_month_arithmetic",  # latest green r6
    "h31_array_hof",  # latest green r6
    "i13_event_transitions",  # latest green r6
    "i14_replication_freshness",  # latest green r6
    "i16_funnel_stages",  # latest green r6
    "i17_retention_cohorts",  # latest green r6
    "i3_latest_state_per_key",  # latest green r6
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
