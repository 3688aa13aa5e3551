#!/usr/bin/env python
"""sf1 scaling checkpoint (VERDICT r4 task 5): validate that the heavy
operators' cost tracks DATA VOLUME, not worse — the cheapest local proxy
for the 100x-scale claims the operator docstrings make.

Builds a 10x corpus from sf0.1 (no external data):

- ``documents``: 10 disjoint replicas; replica i > 0 suffixes every
  whitespace token with ``r{i}``, so every shingle is replica-unique —
  within-replica Jaccard structure (and thus the near-dup pair/cluster
  distribution) is EXACTLY preserved while replicas never collide. A
  10x corpus with the same dup rate, which is what "same distribution,
  more data" means for dedup.
- ``orders``: 10 key-shifted replicas (10x rows for the CDC merge).

Then times dd4 / dd7 / px6 / cdc-merge at sf0.1 and at the 10x dir and
prints one JSON line with per-query seconds and the 10x/1x ratios.
Near-linear ratios (~10, modulo fixed overheads) = pass; super-linear =
a scale bug. Results are recorded in BASELINE.md.

Run: python tools/scale_check.py   (writes .scale_sf1/ under the repo;
     delete the dir to regenerate)

r12 (VERDICT r11 item 7): ``--sf1-low-core`` runs ONLY the sf1 leg on
the most expensive entries, honoring ``$SPARK_GRAFT_CPUS`` — run it once
at 32 and once at 8 to get a core-count ratio with real signal (at
sf0.1 every entry is scheduling-floor-bound and the 8c/32c ratio is
noise; at sf1 the compute is large enough for parallelism to show):

    SPARK_GRAFT_CPUS=32 python tools/scale_check.py --sf1-low-core
    SPARK_GRAFT_CPUS=8  python tools/scale_check.py --sf1-low-core
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".scale_sf1")
N_REPLICAS = 10


def build(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(DST, "_DONE")):
        return
    os.makedirs(DST, exist_ok=True)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for i in range(N_REPLICAS):
        r = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 10_000_000).cast("long")
        )
        if i > 0:  # replica-unique shingles, identical internal structure
            r = r.withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1r{i}")
            )
        parts.append(r)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{DST}/documents.parquet"
    )

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    parts = [
        orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * 1_000_000).cast("long")
        )
        for i in range(N_REPLICAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/orders.parquet")

    # embeddings: 10 replicas, replica i rotates the dimension order by i
    # (a permutation — norms and within-replica cosine structure are
    # EXACTLY preserved, so each replica carries the same neighbor/dup
    # distribution while cross-replica sims decorrelate)
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    parts = []
    for i in range(N_REPLICAS):
        r = emb.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * 10_000_000).cast("long")
        )
        if i > 0:
            rolled = F.concat(
                F.slice("embedding", i + 1, dim - i),
                F.slice("embedding", 1, i),
            )
            r = r.withColumn("embedding", rolled)
        parts.append(r)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{DST}/embeddings.parquet"
    )
    open(os.path.join(DST, "_DONE"), "w").write("ok")


# the 6 most expensive recorded bench entries (BENCH_r11) — the
# low-core sf1 leg measures whether THEY parallelize, since cheap
# entries are floor-bound at any core count
LOW_CORE_NAMES = [
    "dd4_minhash_lsh_pairs",
    "dd7_dedup_groups",
    "px6_neardup_aware_curation",
    "sim11_knn_graph_auto",
    "dd16_embedding_dups_auto",
    "dd5_simhash",
]


def sf1_low_core_leg() -> None:
    """Time the expensive entries at sf1 only, on the session's core
    count (``local[$SPARK_GRAFT_CPUS]``) — callers run this twice (32
    and 8 cores) and compare. dd15's delta ingest rides along via the
    bench helper; fresh dedup caches per query (CLAUDE.md rule)."""
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators import (
        QUERIES,
    )
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.dedup import (
        clear_dedup_cache,
    )
    from sfguide_getting_started_openflow_postgresql_cdc_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="scale_check_low_core")
    build(spark)
    import bench

    QUERIES["tx4_fingerprint"](spark, DST).collect()  # warm-up
    out: dict[str, float] = {}
    # min-of-2 with a cache clear before each pass: single cold-session
    # shots measured 1.5-2.5x apart on identical code (JIT + first-call
    # Python-worker costs dominate one-shot timings at this scale)
    for name in LOW_CORE_NAMES:
        best = None
        for _ in range(2):
            clear_dedup_cache()
            t0 = time.perf_counter()
            QUERIES[name](spark, DST).count()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        out[name] = round(best, 3)
    clear_dedup_cache()
    out["dd15_ingest_10pct_delta"] = round(
        bench._bench_incremental_dedup(spark, DST), 3
    )
    print(
        json.dumps(
            {
                "metric": "sf1_low_core_seconds",
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                "queries": out,
            }
        )
    )


def main() -> None:
    sys.path.insert(0, REPO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-low-core", action="store_true")
    args = ap.parse_args()
    if args.sf1_low_core:
        sf1_low_core_leg()
        return
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators import (
        QUERIES,
    )
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.dedup import (
        clear_dedup_cache,
    )
    from sfguide_getting_started_openflow_postgresql_cdc_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="scale_check")
    build(spark)

    import bench

    names = ["dd4_minhash_lsh_pairs", "dd7_dedup_groups",
             "px6_neardup_aware_curation",
             # r6: distributed global rank, keep-first manifest, and the
             # real-decode audio path at 10x volume
             "e11_rank_distributions", "dd12_keepfirst_manifest",
             "mm7_audio_frame_energy",
             # similarity side at 10x vectors (dim-rotated replicas)
             "sim6_knn_graph", "sim7_kmeans_assign", "dd6_embedding_cosine_dups",
             "sim10_knn_graph_scaled", "dd6_embedding_cosine_dups_scaled",
             # r8: the corpus-adaptive entry points — geometry re-derives
             # at each scale, so the ratio measures the occupancy-constant
             # claim end-to-end (bits grow, bucket occupancy doesn't)
             "sim11_knn_graph_auto", "dd16_embedding_dups_auto",
             # r8 second batch: PQ/ADC search (corpus-relative shortlist
             # — scoring is linear table lookups; the ratio checks the
             # rerank stays shortlist-bounded) and the hamming-banded
             # image near-dup pairs (class count, not corpus, drives
             # the pairwise stage)
             "sim12_knn_pq", "mm9_image_neardup_pairs"]
    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators.ann_auto import (
        AUTO_DUP_THRESHOLD,
        AUTO_KNN_THRESHOLD,
        AUTO_RECALL,
        auto_band_geometry,
    )

    result: dict[str, dict[str, float]] = {}
    for sf_tag, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
        clear_dedup_cache()  # each scale measures its own shingle pass
        # warm-up on an unrelated query so JIT/codegen cost stays out
        QUERIES["tx4_fingerprint"](spark, sf_dir).collect()
        # r11 (VERDICT r10 task 3): record the DERIVED band geometry per
        # scale next to the adaptive-ANN timings, so a ratio drift is
        # attributable (geometry change vs host noise) — sim11/dd16's
        # sf1 ratios moved 3.57x->5.89x / 3.0x->4.17x between r9 and
        # r10 recordings with no code change on that path.
        n_vec = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        )
        for name, thr in (
            ("sim11_knn_graph_auto", AUTO_KNN_THRESHOLD),
            ("dd16_embedding_dups_auto", AUTO_DUP_THRESHOLD),
        ):
            bands, bits = auto_band_geometry(n_vec, thr, AUTO_RECALL)
            result.setdefault(name, {})[f"{sf_tag}_geometry"] = (
                f"n={n_vec} bands={bands} bits={bits}"
            )
        for name in names:
            clear_dedup_cache()
            t0 = time.perf_counter()
            n = QUERIES[name](spark, sf_dir).count()
            result.setdefault(name, {})[sf_tag] = round(
                time.perf_counter() - t0, 3
            )
            result[name][f"{sf_tag}_rows"] = n
        t_merge = bench._bench_cdc_merge(spark, sf_dir)
        result.setdefault("cdc_merge_10pct_churn", {})[sf_tag] = round(
            t_merge, 3
        )
        # r8: maintained-index delta ingest at 10x corpus (fresh index +
        # fresh shingle pass per scale — CLAUDE.md cache rule)
        clear_dedup_cache()
        t_ing = bench._bench_incremental_dedup(spark, sf_dir)
        result.setdefault("dd15_ingest_10pct_delta", {})[sf_tag] = round(
            t_ing, 3
        )
        # r9: maintained curation-manifest delta ingest vs px11 rescan
        # at 10x corpus — the pair whose RATIO demonstrates the delta
        # contract (at sf0.1 the per-job scheduling floor dominates the
        # delta side, exactly like dd15; the rescan grows with the
        # corpus while the delta ingest tracks the dump)
        clear_dedup_cache()
        t_mi, t_mr = bench._bench_incremental_manifest(spark, sf_dir)
        result.setdefault("manifest_ingest_10pct_delta", {})[sf_tag] = round(
            t_mi, 3
        )
        result.setdefault("px11_manifest_rescan", {})[sf_tag] = round(
            t_mr, 3
        )
        # r10: batched vs serial backlog catch-up at both scales — the
        # gap is per-commit overhead (corpus-independent), so the
        # batched ratio should track the serial one while staying ~2.5x
        # cheaper in absolute terms
        clear_dedup_cache()
        t_cs, t_cb = bench._bench_manifest_catchup(spark, sf_dir)
        result.setdefault("manifest_catchup_3dumps_serial", {})[sf_tag] = (
            round(t_cs, 3)
        )
        result.setdefault("manifest_catchup_3dumps_batched", {})[sf_tag] = (
            round(t_cb, 3)
        )
    for name, r in result.items():
        r["ratio_10x"] = round(r["sf1"] / r["sf0.1"], 2)
    print(json.dumps({"metric": "sf1_over_sf01_ratios", "queries": result}))


if __name__ == "__main__":
    main()
