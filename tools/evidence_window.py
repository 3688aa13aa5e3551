"""Regenerate operators/__init__.py::_NEEDS_EVIDENCE_FIRST mechanically.

Rule (VERDICT r3 task 3): a query is UNCHECKED if it has no green driver
row in any CORRECTNESS_r*.json, OR its plan/oracle changed after its
latest green row (list those by hand in CHANGED_SINCE_GREEN each round —
git decides, this script just orders). Window = unchecked first, then
oldest-evidence queries, capped at WINDOW (the driver checks a 50-query
prefix per round).

Run:  python tools/evidence_window.py   # prints the list to paste
"""

import collections
import glob
import json
import os
import re
import sys

WINDOW = 50

# Queries whose PLAN or ORACLE changed since their last green driver row
# (update every round from the round's diffs; new queries go here too).
CHANGED_SINCE_GREEN = [
    # r6: all 17 r5 entries cleared — CORRECTNESS_r05 green (sim4/d15
    # are rows-only by design and auto-rank first as never-green).
    "e11_rank_distributions",      # r6: NEW (percent_rank/cume_dist report)
    "px10_source_mixture_weights",  # r6: NEW (training-mix source weights)
    "i14_replication_freshness",   # r6: NEW (CDC staleness audit)
    "dd12_keepfirst_manifest",     # r6: NEW (per-source dedup manifest)
    "sim7_kmeans_assign",          # r6: NEW (spherical k-means assignment)
    "mm7_audio_frame_energy",      # r6: NEW (PCM frame features, real decode)
    "sim8_kmeans_fit",             # r6: NEW (iterative k-means; rows-only)
    "sim6_knn_graph",              # r6: half-pair candidates + mirrored edges
    "g6_except_all",               # r6: NEW (multiset EXCEPT)
    "g7_intersect_all",            # r6: NEW (multiset INTERSECT)
    "h31_array_hof",               # r6: NEW (array lambda filter/position)
    "d29_modern_aggregates",       # r6: NEW (count_if/bool/max_by family)
    "i15_state_islands",           # r6: NEW (gaps-and-islands runs)
    "dd7_dedup_groups",            # r6: consumes memoized dd4 pairs
    "px6_neardup_aware_curation",  # r6: inherits the pairs memo via dd7
    "sim9_contrastive_pairs",      # r6: NEW (anchor/pos/neg mining)
    "px11_training_manifest",      # r6: NEW (end-to-end curation DAG)
    "e12_value_windows",           # r6: NEW (first/last/nth_value)
    "dd13_cluster_size_histogram",  # r6: NEW (dedup health report)
    "f8_keyset_pagination",        # r6: NEW (cursor pagination)
    "dd14_simhash_hamming_pairs",  # r6: NEW (simhash banding join)
    "mm8_image_dup_groups",        # r6: NEW (perceptual dup groups)
    "i16_funnel_stages",           # r6: NEW (ordered funnel, 3-day windows)
    "i17_retention_cohorts",       # r6: NEW (cohort retention matrix)
    "sim10_knn_graph_scaled",      # r6: NEW (occupancy-constant banding)
]


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest_green: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        for name, row in json.load(open(f)).items():
            green = (
                row.get("rows_match")
                and row.get("schema_match") in (True, None)
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            )
            if green:
                latest_green[name] = max(latest_green.get(name, 0), rnd)
            else:
                latest_green.setdefault(name, 0)

    sys.path.insert(0, repo)
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators import QUERIES

    registered = list(QUERIES)
    for name in registered:
        latest_green.setdefault(name, 0)  # brand-new -> never checked

    def rank(name: str):
        changed = name in CHANGED_SINCE_GREEN
        # changed/new first (stable CHANGED order), then oldest evidence
        return (
            0 if changed else 1,
            CHANGED_SINCE_GREEN.index(name) if changed else latest_green[name],
            name,
        )

    window = sorted(registered, key=rank)[:WINDOW]
    by_age = collections.Counter(
        "changed" if n in CHANGED_SINCE_GREEN else f"green_r{latest_green[n]}"
        for n in window
    )
    print(f"# window of {len(window)} / {len(registered)} registered — {dict(by_age)}")
    print("_NEEDS_EVIDENCE_FIRST = [")
    for n in window:
        tag = (
            "changed/new this round"
            if n in CHANGED_SINCE_GREEN
            else f"latest green r{latest_green[n]}"
        )
        print(f'    "{n}",  # {tag}')
    print("]")


if __name__ == "__main__":
    main()
