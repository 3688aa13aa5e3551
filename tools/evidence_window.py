"""Regenerate operators/__init__.py::_NEEDS_EVIDENCE_FIRST mechanically.

Rule (VERDICT r3 task 3): a query is UNCHECKED if it has no green driver
row in any CORRECTNESS_r*.json, OR its plan/oracle changed after its
latest green row (list those by hand in CHANGED_SINCE_GREEN each round —
git decides, this script just orders). Window = unchecked first, then
oldest-evidence queries, capped at WINDOW (the driver checks a 50-query
prefix per round).

Evidence pinning (VERDICT r6 task 0): the window is a function of the
CORRECTNESS files PRESENT AT GENERATION TIME. The generated output
includes that file list (`_EVIDENCE_FILES`); the drift test re-runs this
script with `--files` set to the committed list, so a driver artifact
dropped into the tree AFTER the commit can never redden a shipped tree.
A fresh artifact only changes the window when a human regenerates.

Run:  python tools/evidence_window.py            # regenerate from all files
      python tools/evidence_window.py --files CORRECTNESS_r01.json,...  # pinned
Paste BOTH generated blocks into operators/__init__.py.
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
    # r12: all r11 entries cleared (CORRECTNESS_r11: every r11-changed
    # query has a green r11 driver row — VERDICT r11 item 8) EXCEPT
    # sim12, which is rows-only by design (err: no_oracle can never
    # read green here) and was r11-changed — kept near the window front
    # per the verdict's convention note.
    "sim12_knn_pq",
    # r12 OPTIMIZATION round: plans changed (results proven identical
    # against every oracle at sf0.001+sf0.01 locally AND via four
    # fresh-process driver sims at sf0.01; see OPTIMIZATION_r12.md) —
    # exchange-free distinct shingle build (gram_rows_distinct: every
    # _doc_shingles/_shingle_batch consumer), connected-components
    # persist skip over the cached pairs memo (dd7 + composers), dd15
    # ingest probe/append overlap + window-carried verify sizes, ANN
    # augmented-cache LRU lifecycle (sim11/dd16 — plan-identical,
    # listed conservatively).
    "dd3_ngram_jaccard_pairs",
    "dd4_minhash_lsh_pairs",
    "dd7_dedup_groups",
    "dd10_containment_pairs",
    "dd11_softdedup_weights",
    "dd13_cluster_size_histogram",
    "dd15_incremental_minhash_pairs",
    "dd16_embedding_dups_auto",
    "px6_neardup_aware_curation",
    "px8_ngram_decontamination",
    "px11_training_manifest",
    "px12_neardup_decontamination",
    "px15_cluster_safe_split",
    "px16_incremental_manifest",
    "px17_incremental_lang_stats",
    "px18_incremental_source_stats",
    "sim11_knn_graph_auto",
]


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    pinned = None
    if len(sys.argv) >= 3 and sys.argv[1] == "--files":
        pinned = [f.strip() for f in sys.argv[2].split(",") if f.strip()]
    if pinned is None:
        files = sorted(
            os.path.basename(f)
            for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        )
    else:
        files = sorted(pinned)

    latest_green: dict[str, int] = {}
    for base in files:
        f = os.path.join(repo, base)
        rnd = int(re.search(r"_r(\d+)\.json$", base).group(1))
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
    unknown = [n for n in CHANGED_SINCE_GREEN if n not in QUERIES]
    assert not unknown, f"CHANGED_SINCE_GREEN names unknown queries: {unknown}"
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
    print("# Evidence files consumed at generation time — the drift test")
    print("# re-runs the generator pinned to exactly this list, so later")
    print("# driver artifact drops cannot redden a shipped tree.")
    print("_EVIDENCE_FILES = [")
    for base in files:
        print(f'    "{base}",')
    print("]")
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
