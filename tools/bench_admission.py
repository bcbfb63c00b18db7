#!/usr/bin/env python
"""Per-batch admission cost vs admitted-corpus size (VERDICT r9 #8): the
measurement that proves (or disproves) the batch-proportional claim for
streaming near-dup admission.

Fixed batch (1,000 docs), growing corpus (5k → 40k docs from the sf1
fixture). For each corpus size, time the FULL per-batch admission
callback under both designs:

- **recompute** (the r9 writer): read the corpus's raw text and run
  ``incremental_dedup`` — re-shingles + re-signs the ENTIRE corpus every
  batch, so per-batch time grows with the corpus.
- **sketch** (the r10 writer): join the persisted ``(id, digest, sig,
  shingles)`` table via ``sketch_incremental_dedup`` — corpus-side work
  is three column-pruned parquet scans; per-batch time should be ~flat.

Both timings include each design's own sink writes (2 for recompute, 3
for sketch — the sketch partition is the price of never re-reading
text). Writes ``ADMISSION_SCALE.json``; SCALE.md quotes the table.

Round 11 extensions (VERDICT r10 #3): the same curve also times
- ``sketch_r2`` — the flat layout with ``rows_per_band=2`` (the band
  candidacy knob: per-band collision rate J^2 instead of J), and
- ``sketch_bucketed`` — the bucketed layout (digest-bucket partitions +
  pre-banded sidecar, ``n_buckets=64``).
Bucket pruning reads ≈ min(1, batch_keys/n_buckets) of each gate's
partitions, so at the curve's batch=1000 every bucket is hit and
bucketed measures pure layout overhead; the ``small_batch`` section
measures the regime the layout targets (batch=100 against the 40k
corpus at n_buckets=1024: digest coverage ~10%, i.e. the key-pruned
slice the VERDICT describes).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_ROWS = 1_000
CORPUS_SIZES = [5_000, 10_000, 20_000, 40_000]
REPS = 2
N_BUCKETS = 64


def recompute_batch_writer(corpus_path, results_path, id_col, text_col,
                           min_jaccard=0.5):
    """The round-9 admission callback, reconstructed verbatim for the A/B:
    classify against the corpus's RAW TEXT via incremental_dedup."""
    from pyspark.sql import functions as F

    from bda_spadochrony_spark.operators.dedup import incremental_dedup

    def admit(batch_df, batch_id):
        spark = batch_df.sparkSession
        batch_df = batch_df.select(id_col, text_col).localCheckpoint()
        try:
            existing = (spark.read.parquet(corpus_path)
                        .where(F.col("batch_id") != F.lit(batch_id))
                        .select(id_col, text_col))
        except Exception:
            existing = spark.createDataFrame([], batch_df.schema)
        flags = incremental_dedup(batch_df, existing, id_col, text_col,
                                  min_jaccard=min_jaccard)
        flags = flags.localCheckpoint()
        flags.write.mode("overwrite") \
            .parquet(f"{results_path}/batch_id={batch_id}")
        admitted = batch_df.join(
            flags.where(F.col("admitted") == 1).select(id_col),
            id_col, "left_semi")
        admitted.write.mode("overwrite") \
            .parquet(f"{corpus_path}/batch_id={batch_id}")

    return admit


def main() -> None:
    from pyspark.sql import functions as F

    from bda_spadochrony_spark.operators.dedup import admission_sketch
    from bda_spadochrony_spark.session import get_session
    from bda_spadochrony_spark.sources.readers import scan
    from bda_spadochrony_spark.streaming.admission import (
        admission_batch_writer, default_sketch_path)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    docs_path = os.path.join(repo, "testdata_sf1", "documents.parquet")
    spark = get_session("bda-bench-admission",
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    docs = scan(spark, docs_path).select("doc_id", "text")
    # deterministic disjoint slices by row_number over doc_id
    ranked = docs.withColumn(
        "__rk", F.row_number().over(
            __import__("pyspark").sql.Window.orderBy("doc_id")))

    if "--small-only" in sys.argv[1:]:
        # refresh just the small-batch pruning section into the
        # committed JSON (the main curve is unchanged by read-side work)
        path = os.path.join(repo, "ADMISSION_SCALE.json")
        with open(path) as f:
            results = json.load(f)
        results["small_batch"] = _small_batch_pruning_point(
            spark, ranked, results)
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(results))
        return
    batch = ranked.where(F.col("__rk") <= BATCH_ROWS) \
        .select("doc_id", "text").localCheckpoint()

    results = {"batch_rows": BATCH_ROWS, "reps": REPS, "corpus": []}
    for size in CORPUS_SIZES:
        corpus_df = ranked.where(
            (F.col("__rk") > BATCH_ROWS) &
            (F.col("__rk") <= BATCH_ROWS + size)).select("doc_id", "text")
        base = tempfile.mkdtemp(prefix=f"bda_admit_bench_{size}_")
        corpus, res = f"{base}/corpus", f"{base}/res"
        sketch = default_sketch_path(corpus)
        # seed batch 0: the admitted corpus + its sketch
        corpus_df.write.parquet(f"{corpus}/batch_id=0")
        admission_sketch(corpus_df, "doc_id", "text", num_hashes=16) \
            .write.parquet(f"{sketch}/batch_id=0")

        # a parallel bucketed seed (its own corpus dir: layouts must not
        # mix inside one sketch table)
        base_b = tempfile.mkdtemp(prefix=f"bda_admit_bench_b{size}_")
        corpus_b, res_b = f"{base_b}/corpus", f"{base_b}/res"
        sketch_b = default_sketch_path(corpus_b)
        corpus_df.write.parquet(f"{corpus_b}/batch_id=0")
        seed_sketch = admission_sketch(corpus_df, "doc_id", "text",
                                       num_hashes=16)
        (seed_sketch.withColumn("dbucket", F.pmod(F.col("digest"),
                                                  F.lit(N_BUCKETS)))
         .repartition(F.col("dbucket"))
         .sortWithinPartitions("dbucket", "digest")
         .write.partitionBy("dbucket").parquet(f"{sketch_b}/batch_id=0"))
        from bda_spadochrony_spark.operators.dedup import _sketch_band_rows
        from bda_spadochrony_spark.streaming.admission import \
            default_bands_path
        (_sketch_band_rows(seed_sketch, "doc_id", "doc_id", 1, 16)
         .withColumn("bucket", F.pmod(F.col("band_hash"), F.lit(N_BUCKETS)))
         .repartition(F.col("bucket"))
         .write.partitionBy("bucket")
         .parquet(f"{default_bands_path(sketch_b)}/batch_id=0"))

        timings, admitted = {}, {}
        for name, cpath, spath, rpath, writer in [
            ("recompute", corpus, sketch, res,
             recompute_batch_writer(corpus, res, "doc_id", "text")),
            ("sketch", corpus, sketch, res,
             admission_batch_writer(corpus, res, "doc_id", "text")),
            ("sketch_r2", corpus, sketch, res,
             admission_batch_writer(corpus, res, "doc_id", "text",
                                    rows_per_band=2)),
            ("sketch_bucketed", corpus_b, sketch_b, res_b,
             admission_batch_writer(corpus_b, res_b, "doc_id", "text",
                                    layout="bucketed",
                                    n_buckets=N_BUCKETS)),
        ]:
            best = None
            for _ in range(REPS):
                for root in (cpath, spath, default_bands_path(spath),
                             rpath):
                    shutil.rmtree(f"{root}/batch_id=1", ignore_errors=True)
                t0 = time.perf_counter()
                writer(batch, 1)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
            admitted[name] = spark.read.parquet(f"{rpath}/batch_id=1") \
                .where(F.col("admitted") == 1).count()
        n_admitted = admitted["sketch"]
        # layout must never move a flag (same r); r2 may admit MORE
        # (J^2 candidacy — the documented recall trade), never fewer
        assert admitted["sketch_bucketed"] == n_admitted, \
            f"bucketed flags diverge: {admitted['sketch_bucketed']}" \
            f" != {n_admitted}"
        assert admitted["recompute"] == n_admitted
        assert admitted["sketch_r2"] >= n_admitted
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(base_b, ignore_errors=True)
        row = {"corpus_docs": size, **timings, "batch_admitted": n_admitted}
        results["corpus"].append(row)
        print(f"corpus={size}: " +
              " ".join(f"{k}={v:.2f}s" for k, v in timings.items()) +
              f" admitted={n_admitted}", flush=True)

    results["small_batch"] = _small_batch_pruning_point(
        spark, ranked, results)

    with open(os.path.join(repo, "ADMISSION_SCALE.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


def _small_batch_pruning_point(spark, ranked, results):
    """The regime the bucketed layout targets: batch (100) << n_buckets
    (1024) << corpus keys — digest-gate partition coverage ~10%, i.e.
    the classify path actually READS a key-pruned slice. Flat vs
    bucketed on the largest corpus of the main curve."""
    from pyspark.sql import functions as F

    from bda_spadochrony_spark.operators.dedup import (_sketch_band_rows,
                                                       admission_sketch)
    from bda_spadochrony_spark.streaming.admission import (
        admission_batch_writer, default_bands_path, default_sketch_path)
    small_rows, buckets = 100, 1024
    size = CORPUS_SIZES[-1]
    small = ranked.where(F.col("__rk") <= small_rows) \
        .select("doc_id", "text").localCheckpoint()
    corpus_df = ranked.where(
        (F.col("__rk") > BATCH_ROWS) &
        (F.col("__rk") <= BATCH_ROWS + size)).select("doc_id", "text")
    out = {"batch_rows": small_rows, "n_buckets": buckets,
           "corpus_docs": size}
    for layout in ("flat", "bucketed"):
        base = tempfile.mkdtemp(prefix=f"bda_admit_small_{layout}_")
        corpus, res = f"{base}/corpus", f"{base}/res"
        sketch = default_sketch_path(corpus)
        corpus_df.write.parquet(f"{corpus}/batch_id=0")
        seed = admission_sketch(corpus_df, "doc_id", "text", num_hashes=16)
        if layout == "flat":
            seed.write.parquet(f"{sketch}/batch_id=0")
        else:
            (seed.withColumn("dbucket", F.pmod(F.col("digest"),
                                               F.lit(buckets)))
             .repartition(F.col("dbucket"))
             .sortWithinPartitions("dbucket", "digest")
             .write.partitionBy("dbucket").parquet(f"{sketch}/batch_id=0"))
            (_sketch_band_rows(seed, "doc_id", "doc_id", 1, 16)
             .withColumn("bucket", F.pmod(F.col("band_hash"),
                                          F.lit(buckets)))
             .repartition(F.col("bucket"))
             .write.partitionBy("bucket")
             .parquet(f"{default_bands_path(sketch)}/batch_id=0"))
        writer = admission_batch_writer(corpus, res, "doc_id", "text",
                                        layout=layout, n_buckets=buckets)
        best = None
        for _ in range(REPS + 1):
            for root in (corpus, sketch, default_bands_path(sketch), res):
                shutil.rmtree(f"{root}/batch_id=1", ignore_errors=True)
            t0 = time.perf_counter()
            writer(small, 1)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[layout] = round(best, 3)
        # CLASSIFY-ONLY split: the layout's read-side claim isolated
        # from its write amplification (partitionBy fans a toy batch
        # into ~B tiny files on local FS — the dominant cost above, and
        # the part that amortizes at production batch sizes where files
        # are row-group-sized)
        from bda_spadochrony_spark.operators.dedup import (
            sketch_incremental_dedup)
        from bda_spadochrony_spark.streaming.admission import (
            _pruned_gate_frames)
        bsk = admission_sketch(small, "doc_id", "text",
                               num_hashes=16).localCheckpoint()
        spark_ = small.sparkSession
        best = None
        for _ in range(REPS + 1):
            t0 = time.perf_counter()
            existing = (spark_.read.parquet(sketch)
                        .where(F.col("batch_id") != F.lit(1))
                        .select("doc_id", "digest", "sig", "shingles",
                                "n_shingles"))
            ex_d = ex_b = None
            if layout == "bucketed":
                ex_d, ex_b = _pruned_gate_frames(
                    spark_, bsk, 1, sketch, default_bands_path(sketch),
                    "doc_id", buckets, 1, 16, _sketch_band_rows)
            sketch_incremental_dedup(
                bsk, existing, "doc_id", min_jaccard=0.5,
                existing_digests=ex_d, existing_bands=ex_b).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[f"{layout}_classify_only"] = round(best, 3)
        shutil.rmtree(base, ignore_errors=True)
    print(f"small_batch: flat={out['flat']:.2f}s "
          f"bucketed={out['bucketed']:.2f}s "
          f"classify flat={out['flat_classify_only']:.2f}s "
          f"bucketed={out['bucketed_classify_only']:.2f}s", flush=True)
    return out


if __name__ == "__main__":
    main()
