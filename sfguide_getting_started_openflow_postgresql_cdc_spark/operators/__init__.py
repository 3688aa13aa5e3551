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
]
_NEEDS_EVIDENCE_FIRST = [
    "h28_array_agg_semistructured",  # changed/new this round
    "mm5_decoded_media_metadata",  # changed/new this round
    "mm6_image_ahash",  # changed/new this round
    "mm8_image_dup_groups",  # changed/new this round
    "mm9_image_neardup_pairs",  # changed/new this round
    "px16_incremental_manifest",  # changed/new this round
    "px17_incremental_lang_stats",  # changed/new this round
    "px18_incremental_source_stats",  # changed/new this round
    "sim12_knn_pq",  # changed/new this round
    "d15_approx_sketches",  # latest green r0
    "sim4_knn_ivf",  # latest green r0
    "sim8_kmeans_fit",  # latest green r0
    "g3_intersect",  # latest green r5
    "g4_except",  # latest green r5
    "h12_to_char_month",  # latest green r5
    "h13_compose_timestamp",  # latest green r5
    "h15_dayname_dayofweek",  # latest green r5
    "h16_modulo",  # latest green r5
    "h1_string_concat",  # latest green r5
    "h20_like_patterns",  # latest green r5
    "h22_array_functions",  # latest green r5
    "h29_time_arithmetic",  # latest green r5
    "h30_edit_distance",  # latest green r5
    "h4_case_bucket",  # latest green r5
    "h5_simple_case",  # latest green r5
    "h6_cast_to_date",  # latest green r5
    "h8_date_arithmetic",  # latest green r5
    "i10_asof_join",  # latest green r5
    "i11_range_join",  # latest green r5
    "px1_corpus_curation",  # latest green r5
    "px7_language_balanced_cap",  # latest green r5
    "px8_ngram_decontamination",  # latest green r5
    "px9_quality_curriculum",  # latest green r5
    "sim3_pairwise_label_centroids",  # latest green r5
    "sim5_range_search",  # latest green r5
    "tx11_repetition_stats",  # latest green r5
    "tx6_bpe_token_count",  # latest green r5
    "tx7_vocab_topk",  # latest green r5
    "c11_dense_grid_report",  # latest green r6
    "c3_left_join_count",  # latest green r6
    "c4_left_join_residual_on",  # latest green r6
    "d14_exact_percentiles",  # latest green r6
    "d16_pivot",  # latest green r6
    "d22_multi_distinct",  # latest green r6
    "d23_unpivot",  # latest green r6
    "d24_value_histogram",  # latest green r6
    "dd12_keepfirst_manifest",  # latest green r6
    "dd14_simhash_hamming_pairs",  # latest green r6
    "dd2_fingerprint_stats",  # latest green r6
    "e11_rank_distributions",  # latest green r6
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
