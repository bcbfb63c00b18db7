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

        timings = {}
        for name, writer in [
            ("recompute", recompute_batch_writer(corpus, res,
                                                 "doc_id", "text")),
            ("sketch", admission_batch_writer(corpus, res,
                                              "doc_id", "text")),
        ]:
            best = None
            for _ in range(REPS):
                for d in ("batch_id=1",):
                    shutil.rmtree(f"{corpus}/{d}", ignore_errors=True)
                    shutil.rmtree(f"{sketch}/{d}", ignore_errors=True)
                    shutil.rmtree(f"{res}/{d}", ignore_errors=True)
                t0 = time.perf_counter()
                writer(batch, 1)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        n_admitted = spark.read.parquet(f"{res}/batch_id=1") \
            .where(F.col("admitted") == 1).count()
        shutil.rmtree(base, ignore_errors=True)
        row = {"corpus_docs": size, **timings, "batch_admitted": n_admitted}
        results["corpus"].append(row)
        print(f"corpus={size}: recompute={timings['recompute']:.2f}s "
              f"sketch={timings['sketch']:.2f}s "
              f"admitted={n_admitted}", flush=True)

    with open(os.path.join(repo, "ADMISSION_SCALE.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
