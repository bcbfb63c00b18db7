#!/usr/bin/env python
"""Scale-evidence run (VERDICT r5 ask #6): time the dedup / ANN /
streaming / corpus / stats family at sf0.1 (driver testdata) AND at 10×
rows (``testdata_sf1``, built by ``tools/gen_scale_data.py`` to mirror
the sf0.1 distributions), in one warmed session per scale, and write
``BENCH_SF1.json`` with per-query times and scaling factors.

Reading the factors: data volume grows 10×, so a scan-bound map-only
operator should scale ≲10× (fixed per-job overhead amortizes — factors
well under 10 mean sf0.1 time was mostly scheduling floor, which is
evidence FOR the scale design, not against it); candidate-generation
operators (LSH bands, bucket joins) should stay near-linear because
candidates are family-bounded; the iterative CC loop adds O(log n)
rounds. A factor ≫10 flags a quadratic path — the thing this run
exists to catch. The run also exercises the HLL coupon-regime guard at
1M events (it must NOT raise: per-hour distinct keys stay inside the
exact regime).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# contract queries that read only documents/embeddings/events
FAMILY = [
    "exact_dedup", "exact_dedup_digest", "minhash_near_dup",
    "simhash_md5_pairs", "incremental_dedup", "dedup_survivors",
    "embedding_topk", "embedding_ann_stack", "embedding_near_dup",
    "embedding_covariance", "embedding_standardize", "pca_invariants",
    "heavy_hitters", "tokens_to_ids", "bpe_pair_counts",
    "unigram_surprisal", "quality_gate", "contamination",
    "pack_documents", "corpus_shuffle", "hash_split",
    "sketch_mergeable", "pagerank_step", "label_propagation",
    "funnel", "cohort_retention", "token_pmi",
    # folded in from the r6 addendum + the r7 composite
    "span_dedup", "bm25_search", "corpus_pipeline",
    # r8: the corpus-sized quantizer (cells_for default) — the factor
    # VERDICT r7 #1 asked to re-measure under the calibrated cell count
    "semantic_dedup",
    # r9: the neighbor-cell-probed variant (n_probe=2 pair generation)
    "semantic_dedup_probed",
    # r10: BPE encode, the chained text->semantic-dedup loop, PQ
    "bpe_encode", "text_semantic_dedup", "pq_codes", "embedding_pq_stack",
    "embedding_ivf_pq",
    # r11: the tokenizer loop closed end-to-end + the production
    # (balanced-KMeans) IVF-PQ path
    "tokenizer_pipeline", "embedding_ivf_pq_kmeans", "stream_ann_index",
    "detokenize", "higher_order_funcs", "map_funcs", "budget_sample",
    "corpus_diff",
    # r12: the codes-only streamed index, the byte-fallback tokenizer
    # loop (encode + lossless decode), and the drift monitor
    "stream_ann_index_pq", "tokenizer_bytes", "detokenize_bytes",
    "quantizer_drift",
    "stream_hourly", "stream_distinct", "stream_sliding",
    "stream_join_outer",
]

# the stateful-streaming family re-measured per state-store provider
# (VERDICT r6 ask #4: the sizing story was asserted, not measured)
STREAMING = ["stream_join_outer", "stream_distinct", "stream_sliding"]

# Fresh-JVM family shards (r11): the r11 full regen ran the (by then)
# 48-query family twice in ONE session and the tail of the list
# inflated 2-3x vs isolated runs (tokenizer_pipeline 8.05 -> 19.4 s at
# sf1 on identical code) — the exact single-session codegen/GC load
# bench.py's r6/r10 A/Bs measured and fixed with subprocess shards.
# Each shard is a fresh JVM, warms ITS slice at sf0.001, times it at
# the target sf, and reports the bench.py canary queries (report-only
# here: the committed ledger's floors are sf0.1 cold numbers, and this
# harness also runs at sf1 where they do not apply).
FAMILY_SHARD_SIZE = 16


def run_family_shard(shard: int, sf_dir: str) -> None:
    """Child mode: time FAMILY[shard*K:(shard+1)*K] in a fresh JVM."""
    from bda_spadochrony_spark.session import get_session
    import __spark_entry__ as entry_mod

    spark = get_session(f"bda-bench-scale-s{shard}",
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    names = FAMILY[shard * FAMILY_SHARD_SIZE:(shard + 1) * FAMILY_SHARD_SIZE]
    for name in names:
        try:
            qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
    canary = {}
    try:
        import bench
        for cn in bench.CANARY_REF:
            qs[cn](spark, "/root/testdata/sf0.001").count()
            t0 = time.perf_counter()
            qs[cn](spark, "/root/testdata/sf0.1").count()
            canary[cn] = round(
                (time.perf_counter() - t0) / bench.CANARY_REF[cn], 2)
    except Exception:
        pass
    out: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        out[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"times": out, "canary_ratios_vs_sf01_ledger": canary}))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf01 = "/root/testdata/sf0.1"
    sf1 = os.path.join(repo, "testdata_sf1")

    if len(sys.argv) > 2 and sys.argv[1].startswith("--family-shard="):
        run_family_shard(int(sys.argv[1].split("=")[1]),
                         sys.argv[2].split("=", 1)[1])
        return

    from bda_spadochrony_spark.session import get_session
    import __spark_entry__ as entry_mod

    spark = get_session("bda-bench-scale",
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    shard_canaries: dict[str, dict] = {}

    def timed_pass(sf_dir: str) -> dict[str, float]:
        import subprocess
        out: dict[str, float] = {}
        n_shards = (len(FAMILY) + FAMILY_SHARD_SIZE - 1) // FAMILY_SHARD_SIZE
        for s in range(n_shards):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 f"--family-shard={s}", f"--sf={sf_dir}"],
                capture_output=True, text=True, cwd=repo)
            if r.returncode != 0:
                sys.stderr.write(r.stderr[-2000:])
                raise SystemExit(f"family shard {s} failed")
            payload = json.loads(r.stdout.strip().splitlines()[-1])
            out.update(payload["times"])
            shard_canaries[f"{os.path.basename(sf_dir)}_s{s}"] = \
                payload["canary_ratios_vs_sf01_ledger"]
            for name, t in payload["times"].items():
                print(f"  {name}: {t:.2f}s", flush=True)
        return out

    def probe_join_state(sf_dir: str, events_glob: str = "events*.parquet",
                         max_files: int | None = None) -> dict:
        """Run the signature stream-stream full-outer interval join with a
        captured query handle and report the LAST micro-batch's state-store
        metrics (rows held, provider memory) — the numbers use_rocksdb_state
        exists to bound. Mirrors q_stream_join_outer's pipeline.
        ``events_glob``/``max_files`` let the r8 drain A/B replay the same
        join over a many-file copy of the events in bounded micro-batches."""
        from bda_spadochrony_spark.streaming.sources import file_stream
        from bda_spadochrony_spark.plans.stream_fused import fused_stream_join
        from bda_spadochrony_spark.streaming.runner import run_to_memory
        from pyspark.sql import functions as F
        errors = (file_stream(spark, f"{sf_dir}/{events_glob}",
                              entry_mod.EVENTS_SCHEMA,
                              max_files_per_trigger=max_files)
                  .where(F.col("event_type") == "error")
                  .select(F.col("event_id").alias("err_id"),
                          F.col("user_id").alias("err_user"),
                          F.col("ts").alias("err_ts")))
        clicks = (file_stream(spark, f"{sf_dir}/{events_glob}",
                              entry_mod.EVENTS_SCHEMA,
                              max_files_per_trigger=max_files)
                  .where(F.col("event_type") == "click")
                  .select(F.col("event_id").alias("click_id"),
                          F.col("user_id").alias("click_user"),
                          F.col("ts").alias("click_ts")))
        joined = fused_stream_join(errors, clicks, "err_ts", "click_ts")
        t0 = time.perf_counter()
        q, _ = run_to_memory(joined, available_now=True)
        q.awaitTermination(1500)
        drain_s = round(time.perf_counter() - t0, 3)
        progs = [p for p in q.recentProgress if p.get("stateOperators")]
        last_ops = progs[-1]["stateOperators"] if progs else []
        return {
            "drain_sec": drain_s,
            "micro_batches": len(q.recentProgress),
            "state_rows_total": sum(o.get("numRowsTotal", 0)
                                    for o in last_ops),
            "state_memory_bytes": sum(o.get("memoryUsedBytes", 0)
                                      for o in last_ops),
        }

    def streaming_pass(sf_dir: str, rocksdb: bool) -> dict:
        from bda_spadochrony_spark.streaming.runner import use_rocksdb_state
        # the sf1 full-outer join drain runs ~170 s on the heap provider
        # and 3-4x that under RocksDB (per-micro-batch snapshot/compaction
        # overhead) — 1500 s leaves headroom over the contract 300 s default
        prev_timeout = os.environ.get("SPARK_GRAFT_STREAM_TIMEOUT_S")
        os.environ["SPARK_GRAFT_STREAM_TIMEOUT_S"] = "1500"
        key = "spark.sql.streaming.stateStore.providerClass"
        prev = use_rocksdb_state(spark, rocksdb)
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            times = {}
            for name in STREAMING:
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).count()
                times[name] = round(time.perf_counter() - t0, 3)
                print(f"  {name}: {times[name]:.2f}s", flush=True)
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            state = probe_join_state(sf_dir)
            print(f"  join_state: {state}", flush=True)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
            if prev:
                spark.conf.set(key, prev)
            else:
                use_rocksdb_state(spark, False)
            # restore the stream-drain timeout so later benches in this
            # process run under the contract default (ADVICE r8)
            if prev_timeout is None:
                os.environ.pop("SPARK_GRAFT_STREAM_TIMEOUT_S", None)
            else:
                os.environ["SPARK_GRAFT_STREAM_TIMEOUT_S"] = prev_timeout
        return {"times": times, "join_state": state}

    print("== sf0.1 ==", flush=True)
    t01 = timed_pass(sf01)
    print("== sf1 (10x) ==", flush=True)
    t1 = timed_pass(sf1)

    streaming_state = {}
    for sf_name, sf_dir in [("sf0.1", sf01), ("sf1", sf1)]:
        for provider in ["hdfs_heap", "rocksdb"]:
            print(f"== streaming state: {sf_name} {provider} ==", flush=True)
            streaming_state[f"{sf_name}_{provider}"] = streaming_pass(
                sf_dir, provider == "rocksdb")

    # r8 (VERDICT r7 #3): the RocksDB 3.3x drain overhead was measured
    # under FULL-SNAPSHOT checkpoints on 2 giant availableNow batches —
    # the worst case for RocksDB (every batch re-snapshots the whole
    # store). A/B the two production mitigations on the sf1 join drain:
    # changelog checkpointing (upload the delta, snapshot in background)
    # and a many-small-batches drain (maxFilesPerTrigger over a 24-file
    # copy — the steady-state shape where snapshot cost amortizes).
    import shutil
    import tempfile
    from bda_spadochrony_spark.streaming.runner import use_rocksdb_state
    from bda_spadochrony_spark.sources.readers import scan
    split_dir = tempfile.mkdtemp(prefix="bda_sf1_events_split_")
    (scan(spark, f"{sf1}/events.parquet").repartition(24)
     .write.mode("overwrite").parquet(split_dir))
    prev_timeout = os.environ.get("SPARK_GRAFT_STREAM_TIMEOUT_S")
    os.environ["SPARK_GRAFT_STREAM_TIMEOUT_S"] = "1500"
    ch_key = ("spark.sql.streaming.stateStore.rocksdb."
              "changelogCheckpointing.enabled")
    drain_ab = {}
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        for label, rocksdb, changelog, split in [
                ("heap_2batch", False, False, False),
                ("rocksdb_snapshot_2batch", True, False, False),
                ("rocksdb_changelog_2batch", True, True, False),
                ("rocksdb_snapshot_24batch", True, False, True),
                ("rocksdb_changelog_24batch", True, True, True)]:
            print(f"== drain A/B: {label} ==", flush=True)
            prev_provider = use_rocksdb_state(spark, rocksdb)
            spark.conf.set(ch_key, str(changelog).lower())
            try:
                if split:
                    drain_ab[label] = probe_join_state(
                        split_dir, events_glob="part-*.parquet", max_files=1)
                else:
                    drain_ab[label] = probe_join_state(sf1)
            finally:
                spark.conf.unset(ch_key)
                if prev_provider:
                    spark.conf.set(
                        "spark.sql.streaming.stateStore.providerClass",
                        prev_provider)
                else:
                    use_rocksdb_state(spark, False)
            print(f"  {label}: {drain_ab[label]}", flush=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(split_dir, ignore_errors=True)
        # restore the stream-drain timeout: leaving 1500 s exported would
        # leak into the calibrated corpus-pipeline run below and any
        # later bench in this process (ADVICE r8)
        if prev_timeout is None:
            os.environ.pop("SPARK_GRAFT_STREAM_TIMEOUT_S", None)
        else:
            os.environ["SPARK_GRAFT_STREAM_TIMEOUT_S"] = prev_timeout

    # the CALIBRATED corpus pipeline (production config) at both scales:
    # the contract row keeps the oracle's fixed band, which is
    # gate-dominated at the sf1 Zipfian corpus (0 survivors, downstream
    # stages idle) — this row measures all six stages doing real work
    from bda_spadochrony_spark.plans.pipelines import corpus_pipeline
    from bda_spadochrony_spark.sources.readers import scan
    calib = {}
    for sf_name, sf_dir in [("sf0.1", sf01), ("sf1", sf1)]:
        t0 = time.perf_counter()
        n = corpus_pipeline(scan(spark, f"{sf_dir}/documents.parquet"),
                            calibrate_surprisal=True).count()
        calib[sf_name] = {"sec": round(time.perf_counter() - t0, 3),
                          "rows": n}
        print(f"  corpus_pipeline_calibrated {sf_name}: {calib[sf_name]}",
              flush=True)

    factors = {k: round(t1[k] / t01[k], 2) if t01[k] > 0 else None
               for k in FAMILY}
    payload = {
        "sf0.1": t01, "sf1": t1, "factor_10x_data": factors,
        "sum_sf0.1": round(sum(t01.values()), 2),
        "sum_sf1": round(sum(t1.values()), 2),
        "family_shard_canaries": {
            **shard_canaries,
            "note": ("per fresh-JVM family shard: bench.py's pinned "
                     "canary queries at sf0.1 vs the committed healthy "
                     "ledger floors (report-only; ~1.0 = healthy "
                     "window). Shards exist because the r11 full regen "
                     "measured the 48-plan single-session tail 2-3x "
                     "inflated vs isolated runs — the bench.py r6/r10 "
                     "session-load artifact, same fix")},
        "note": ("10x rows in documents/embeddings/events "
                 "(tools/gen_scale_data.py). factor ~= marginal cost of "
                 "10x data; << 10 means the sf0.1 time was scheduling "
                 "floor; >> 10 flags a super-linear path. FIXTURE v2 "
                 "(r7): documents draw from a Zipfian 10k-type "
                 "vocabulary — the r6 31-token vocab made random-pair "
                 "Jaccard ~1e-3 and the minhash factor measured the "
                 "fixture; ANN contract queries now also size planes "
                 "from the corpus (planes_for default), so the ann/lsh "
                 "rows are at the design point the r6 VERDICT asked "
                 "to re-record. corpus_pipeline's sf1 row is "
                 "gate-dominated: the fixed surprisal band tuned on "
                 "the driver testdata drops the entire Zipfian corpus "
                 "(0 survivors) - corpus.surprisal_band is the "
                 "production calibration, same lesson as planes_for."),
        "corpus_pipeline_calibrated": {
            **calib,
            "note": ("plans/pipelines.corpus_pipeline with "
                     "calibrate_surprisal=True (surprisal_band "
                     "percentiles of the corpus's own distribution) - "
                     "the production config; all six stages do real "
                     "work at both scales, unlike the fixed-band "
                     "contract row at sf1"),
        },
        "rocksdb_drain_ab": {
            **drain_ab,
            "note": ("r8 A/B of the sf1 full-outer join drain per "
                     "provider/checkpoint/batching config. The r7 3.3x "
                     "RocksDB overhead was full-snapshot checkpoints on "
                     "2 giant availableNow batches; changelog "
                     "checkpointing uploads per-batch deltas and the "
                     "24-file drain (maxFilesPerTrigger=1) is the "
                     "steady-state micro-batch shape. drain_sec is the "
                     "probe join only (not the 3-query family)."),
        },
        "streaming_state_addendum": {
            **streaming_state,
            "note": ("the stateful family per state-store provider "
                     "(VERDICT r6 #4). join_state = last micro-batch of "
                     "the signature full-outer interval join probed via "
                     "recentProgress: rows held in state and provider "
                     "memory. RocksDB bounds executor-heap state (its "
                     "memory figure is block-cache + memtable, off-heap) "
                     "— the provider to run when state ~ key cardinality "
                     "x watermark horizon at 100 TB."),
        },
    }
    with open(os.path.join(repo, "BENCH_SF1.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({"sum_sf0.1": payload["sum_sf0.1"],
                      "sum_sf1": payload["sum_sf1"]}))


if __name__ == "__main__":
    main()
