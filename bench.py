#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is executed once to warm the JVM/scan caches? No — per the
measurement contract we time the real first run of each query after one
session-wide warmup query, which amortizes JVM/codegen startup the way a
long-lived cluster session would. Timing = query BUILD + full action
(``collect`` of the final, already-small result; large row-count queries
are counted, not collected, so the bench measures engine throughput, not
driver transfer). Build time is included because streaming contract
queries (``stream_*``) drain their input inside the builder — timing only
the post-hoc action would under-report them (round 1 did; the round-2
numbers for ``stream_hourly`` are the honest ones).
"""

from __future__ import annotations

import json
import os
import re
import time

HEADLINE = [
    # name, action ('count' for wide results, 'collect' for small aggregates)
    ("hourly_agg", "collect"),
    ("hourly_with_mode", "collect"),
    ("mode_event_type", "collect"),
    ("two_level_avg", "count"),
    ("pricing_summary", "collect"),
    ("star_join", "collect"),
    ("range_window_sum", "count"),
    ("interval_join_batch", "count"),
    ("top_k_per_group", "collect"),
    ("union_drift", "collect"),
    ("exact_dedup", "count"),
    ("text_stats", "count"),
    ("semi_join", "collect"),
    ("anti_join", "collect"),
    ("range_window_partitioned", "count"),
    ("minhash_near_dup", "count"),
    ("embedding_topk", "count"),
    ("text_quality", "count"),
    ("ml_features", "count"),
    ("stream_hourly", "count"),
    # round 2 additions
    ("traffic_hourly", "collect"),
    ("traffic_hourly_fused", "collect"),
    ("stream_join_outer", "count"),
    ("stream_sliding", "count"),
    ("tz_hourly", "collect"),
    ("exact_dedup_digest", "count"),
    ("window_analytics", "count"),
    ("embedding_near_dup", "count"),
    ("min_cost_per_part", "count"),
    ("market_share", "collect"),
    ("stats_agg", "collect"),
    # round 3 additions
    ("shipping_priority", "collect"),
    ("local_supplier_volume", "collect"),
    ("customer_distribution", "collect"),
    ("large_volume_customer", "count"),
    ("corpus_prep", "collect"),
    ("doc_chunks", "count"),
    ("hash_sample", "count"),
    ("tf_idf", "count"),
    ("sql_surface", "collect"),
    # round 4 additions
    ("nation_profit", "collect"),
    ("disjunctive_revenue", "collect"),
    ("repetition_stats", "count"),
    ("pii_scrub", "count"),
    ("contamination", "count"),
    ("pack_documents", "count"),
    ("doc_fingerprint_md5", "count"),
    ("simhash_md5_pairs", "count"),
    ("embedding_quantize", "count"),
    ("embedding_ann_stack", "count"),
    ("tokens_to_ids", "count"),
    ("sketch_mergeable", "collect"),
    ("balanced_sample", "count"),
    ("column_profile", "collect"),
    # round 5 additions
    ("ml_linear_fit", "collect"),
    ("heavy_hitters", "collect"),
    ("unigram_surprisal", "count"),
    ("mixture_sample", "count"),
    ("embedding_covariance", "count"),
    ("dedup_survivors", "count"),
    ("hash_split", "count"),
    ("bpe_pair_counts", "collect"),
    ("embedding_standardize", "count"),
    ("corpus_shuffle", "collect"),
    ("incremental_dedup", "count"),
    ("pca_project", "count"),
    ("stream_enrich", "collect"),
    ("centroid_classify", "count"),
    ("classify_eval", "collect"),
    ("source_kl", "collect"),
    ("quality_gate", "count"),
    ("kmeans_step", "count"),
    ("embedding_outliers", "collect"),
    ("skew_diagnostics", "collect"),
    ("zorder_layout", "collect"),
    ("scd2_history", "count"),
    ("join_cardinality", "collect"),
    ("funnel", "collect"),
    ("cohort_retention", "collect"),
    ("expectations", "collect"),
    ("token_pmi", "collect"),
    ("pagerank_step", "count"),
    ("equi_depth_histogram", "collect"),
    ("stream_distinct", "count"),
    ("bigram_surprisal", "count"),
    ("pit_join", "count"),
    ("entity_match", "count"),
    ("weighted_sample", "count"),
    ("label_propagation", "count"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from bda_spadochrony_spark.session import get_session
    import __spark_entry__ as entry_mod

    # no progress bars: they share stdout with the contract JSON line and
    # flooded the driver's bounded tail capture in round 4
    spark = get_session("bda-bench",
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # one warmup action so JVM/codegen startup isn't billed to the first query
    qs["hourly_agg"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    build: dict[str, float] = {}
    execute: dict[str, float] = {}
    for name, action in HEADLINE:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        if action == "collect":
            df.collect()
        else:
            df.count()
        t2 = time.perf_counter()
        timings[name] = round(t2 - t0, 3)
        build[name] = round(t1 - t0, 3)
        execute[name] = round(t2 - t1, 3)

    # The driver captures a bounded tail of stdout and parses the final
    # line as JSON — round 3's line (with per-query build/exec dicts
    # inlined) overflowed that window and failed to parse. Keep the stdout
    # line to the contract fields only, compactly encoded, and park the
    # build/exec split in a side file for human inspection.
    # second timed run for the slow queries: the cold number above bills
    # first-use codegen/JIT to whichever query triggers it; the warm number
    # is the long-lived-cluster-session throughput (what a resident engine
    # at 100 TB actually sustains). Reported in the side file only — the
    # contract line stays the honest cold measurement.
    warm: dict[str, float] = {}
    for name, action in HEADLINE:
        if timings[name] < 1.5:
            continue
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        if action == "collect":
            df.collect()
        else:
            df.count()
        warm[name] = round(time.perf_counter() - t0, 3)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SPLIT.json"), "w") as fh:
        json.dump({"build": build, "exec": execute, "warm_rerun": warm,
                   "sf": sf}, fh, indent=1)

    # keep the contract line under the driver's 2 KB stdout tail (round 3
    # overflowed it; at 89 queries 2-decimal values crossed 2048 again):
    # per-query values at 1 decimal — comfortably inside measurement noise
    # (±1 s run-to-run) — with the 3-decimal split in BENCH_SPLIT.json
    payload = {
        "metric": "wall sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 1) for k, v in timings.items()},
        "sf": sf,
    }
    line = json.dumps(payload, separators=(",", ":"))
    # hard guard: if the query list grows past the tail budget, drop the
    # CHEAPEST queries from the line (their full timings stay in
    # BENCH_SPLIT.json) rather than overflow and parse as null
    for name, _ in sorted(timings.items(), key=lambda kv: kv[1]):
        if len(line) <= 1900:
            break
        del payload["queries"][name]
        line = json.dumps(payload, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
