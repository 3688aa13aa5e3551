#!/usr/bin/env python
"""Per-query perf probe (optimization rounds, guide §1).

For each named registry query: capture ``explain("formatted")`` to
``plans/<tag>/<name>_<suffix>.txt`` and time the computation against the
noop sink (guide §1.4 — eager full-column materialization, no result
transfer), min-of-N, with the job labelled in the UI.

Usage::

    python tools/perf_probe.py [--queries a,b,c | --top] \
        [--suffix before|after] [--passes 3] [--no-explain] [--ui]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line: {"noop_sec": {name: s}, "sf_dir": ...}.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

# the dozen most expensive recorded entries (BENCH_r10 / BASELINE r11)
TOP = [
    "dd15_ingest_10pct_delta",  # bench-harness query, probed via bench fns
    "sim11_knn_graph_auto",
    "dd16_embedding_dups_auto",
    "dd7_dedup_groups",
    "px6_neardup_aware_curation",
    "dd5_simhash",
    "px13_exact_substring_spans",
    "dd4_minhash_lsh_pairs",
    "tx10_tfidf_top_terms",
    "e11_rank_distributions",
    "sim12_knn_pq",
    "d3_tpch_q1_pricing_summary",
    "px11_training_manifest",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--top", action="store_true")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--no-explain", action="store_true")
    ap.add_argument("--plans-dir", default="plans/r11")
    ap.add_argument("--ui", action="store_true")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from sfguide_getting_started_openflow_postgresql_cdc_spark.session import (
        get_spark,
    )

    extra = {"spark.ui.enabled": "true"} if args.ui else None
    spark = get_spark(app_name="perf_probe", extra_conf=extra)

    from sfguide_getting_started_openflow_postgresql_cdc_spark.operators import (
        QUERIES,
    )

    names = [q for q in args.queries.split(",") if q]
    if args.top:
        names = [n for n in TOP if n in QUERIES]
    if not names:
        names = [n for n in TOP if n in QUERIES]

    plans_dir = os.path.join(repo, args.plans_dir)
    os.makedirs(plans_dir, exist_ok=True)

    # warm-up (bench.py protocol)
    QUERIES["b2_select_star"](spark, sf_dir).collect()
    QUERIES["c5_join_derived_table"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        if not args.no_explain:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        sc = spark.sparkContext
        if args.passes <= 0:
            print(f"  {name}: plan captured", file=sys.stderr)
            continue
        best = None
        for i in range(args.passes):
            sc.setJobDescription(f"{name} noop pass {i}")
            # fresh builder per pass INSIDE the timed region (bench.py
            # parity: operators like dd7 run driver-coordinated jobs at
            # build time); memoized upstreams (dedup shingle memo etc.)
            # stay warm exactly as in bench.py's min-of-3
            t0 = time.perf_counter()
            d = QUERIES[name](spark, sf_dir)
            d.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        sc.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]} s", file=sys.stderr)

    print(json.dumps({"noop_sec": timings, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
