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
]
_NEEDS_EVIDENCE_FIRST = [
    "c18_important_parts",  # changed/new this round
    "dd4_minhash_lsh_pairs",  # changed/new this round
    "dd3_ngram_jaccard_pairs",  # changed/new this round
    "dd10_containment_pairs",  # changed/new this round
    "dd15_incremental_minhash_pairs",  # changed/new this round
    "dd7_dedup_groups",  # changed/new this round
    "px6_neardup_aware_curation",  # changed/new this round
    "px15_cluster_safe_split",  # changed/new this round
    "dd11_softdedup_weights",  # changed/new this round
    "dd13_cluster_size_histogram",  # changed/new this round
    "px12_neardup_decontamination",  # changed/new this round
    "mm5_decoded_media_metadata",  # changed/new this round
    "mm6_image_ahash",  # changed/new this round
    "mm8_image_dup_groups",  # changed/new this round
    "mm9_image_neardup_pairs",  # changed/new this round
    "px16_incremental_manifest",  # changed/new this round
    "c7_anti_join",  # changed/new this round
    "px17_incremental_lang_stats",  # changed/new this round
    "px18_incremental_source_stats",  # changed/new this round
    "d15_approx_sketches",  # latest green r0
    "sim12_knn_pq",  # latest green r0
    "sim4_knn_ivf",  # latest green r0
    "sim8_kmeans_fit",  # latest green r0
    "dd1_exact_dedup",  # latest green r4
    "dd6_embedding_cosine_dups",  # latest green r4
    "e10_range_interval_frame",  # latest green r4
    "e1_pct_of_total",  # latest green r4
    "e2_nested_agg_window",  # latest green r4
    "e3_partitioned_window",  # latest green r4
    "e4_listagg_distinct",  # latest green r4
    "e5_lag_lead",  # latest green r4
    "flagship_revenue_by_nation",  # latest green r4
    "h11_timestampdiff_minute",  # latest green r4
    "h14_date_trunc_hour",  # latest green r4
    "h21_regexp_extract",  # latest green r4
    "h28_array_functions",  # latest green r4
    "h2_h3_round_nullif",  # latest green r4
    "a5_generate_series",  # latest green r5
    "b1_project_filter",  # latest green r5
    "c10_salted_skew_join",  # latest green r5
    "d25_top_percent",  # latest green r5
    "dd8_semantic_dedup_groups",  # latest green r5
    "e6_moving_frame",  # latest green r5
    "e7_rank_functions",  # latest green r5
    "e8_running_total",  # latest green r5
    "f4_topk_global",  # latest green r5
    "f6_topk_per_group",  # latest green r5
    "f7_pagination",  # latest green r5
    "g1_union_all_rowcounts",  # latest green r5
    "g2_data_quality_nulls",  # latest green r5
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
