#!/usr/bin/env python
"""Stage-split measurement of ``stream_ann_index_maintain`` at 10× data
(r14, VERDICT r13 #6): the one-call maintenance loop was unit-tested
(quiet→fire→rebuild→quiet) but had no sf1 number — and its expensive
leg is the REBUILD's refit, which re-fits a balanced quantizer on the
index's own stored rows. This run stages the sf1 embeddings
(testdata_sf1, 20k×64 float64) as two streamed epochs and times each
stage in the maintain loop's own order, then runs the one-call
composition twice (quiet pass and forced-rebuild pass) end-to-end in
the same fresh JVM. Prints one JSON line; paste the numbers into
SCALE.md's round-14 section.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bda_spadochrony_spark.operators.similarity import (
        ann_index_compact, ann_index_drift, ann_index_rebuild,
        kmeans_centers)
    from bda_spadochrony_spark.streaming.ann_index import (
        stream_ann_index_build, stream_ann_index_maintain)
    from bda_spadochrony_spark.streaming.sources import file_stream

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SF_DIR", "/root/repo/testdata_sf1")

    from bda_spadochrony_spark.sources.readers import scan
    emb = scan(spark, f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    base = tempfile.mkdtemp(prefix="bda_maintain_sf1_")
    in_dir, index, ckpt = f"{base}/in", f"{base}/index", f"{base}/ckpt"
    t: dict[str, float] = {}

    def clock(name, fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = round(time.perf_counter() - t0, 2)
        return out

    # fit-time artifacts (persisted once in production)
    centers = clock("fit_centers", lambda: kmeans_centers(
        emb, "embedding", seed=42).localCheckpoint())
    emb.where(F.col("vec_id") % 2 == 0).write.parquet(f"{in_dir}/b0")
    emb.where(F.col("vec_id") % 2 == 1).write.parquet(f"{in_dir}/b1")
    schema = emb.schema

    only_pq = os.environ.get("ONLY_PQ") == "1"
    # stage split, the maintain loop's own order
    only_pq or clock("drain_2_epochs", lambda: stream_ann_index_build(
        file_stream(spark, f"{in_dir}/*/*.parquet", schema),
        index, centers, "vec_id", checkpoint=ckpt, profile=True))
    if not only_pq:
        clock("compact", lambda: ann_index_compact(spark, index))
    if only_pq:
        # true fit-time census (one corpus pass) so the quiet pass
        # really is quiet when the raw index was never built
        from bda_spadochrony_spark.operators.similarity import (
            quantizer_profile)
        reference = quantizer_profile(emb, centers, "vec_id") \
            .localCheckpoint()
    else:
        reference = (spark.read.parquet(f"{index}/_profile")
                     .groupBy("cell")
                     .agg(F.sum("n").alias("n"),
                          (F.sum("sum_d2") / F.sum("n"))
                          .alias("mean_d2")))
        reference = (centers.select("cell")
                     .join(reference, "cell", "left")
                     .select("cell",
                             F.coalesce("n", F.lit(0)).alias("n"),
                             "mean_d2").localCheckpoint())
        clock("drift_check", lambda: ann_index_drift(
            spark, index, centers, reference).collect())
        # the expensive leg: rebuild = refit kmeans on the index's own
        # rows + one full re-layout write (a compaction under new
        # centers)
        clock("rebuild", lambda: ann_index_rebuild(spark, index,
                                                   seed=43))

        # one-call composition, fresh index/checkpoint: quiet pass
        # (drift does not fire) and forced-rebuild pass (max_kl=-1)
        for tag, kl in (("maintain_quiet", 0.1),
                        ("maintain_rebuild", -1.0)):
            idx2, ck2 = f"{base}/{tag}", f"{base}/{tag}_ck"
            clock(tag, lambda idx2=idx2, ck2=ck2, kl=kl:
                  stream_ann_index_maintain(
                      file_stream(spark, f"{in_dir}/*/*.parquet",
                                  schema),
                      idx2, centers, reference, "vec_id",
                      checkpoint=ck2, compact_every=2, max_kl=kl))

    # codes-layout loop (r14): the PQ rebuild refits quantizer AND
    # codebooks from the corpus source and re-encodes everything —
    # budget it as fit + full re-encode, the costliest maintenance leg
    from bda_spadochrony_spark.operators.similarity import pq_codebooks
    from bda_spadochrony_spark.streaming.ann_index import (
        stream_ann_index_maintain_pq)
    cbs = clock("fit_codebooks", lambda: pq_codebooks(emb, "vec_id"))
    for tag, kl in (("maintain_pq_quiet", 0.1),
                    ("maintain_pq_rebuild", -1.0)):
        idx2, ck2 = f"{base}/{tag}", f"{base}/{tag}_ck"
        clock(tag, lambda idx2=idx2, ck2=ck2, kl=kl:
              stream_ann_index_maintain_pq(
                  file_stream(spark, f"{in_dir}/*/*.parquet", schema),
                  idx2, centers, cbs, reference, emb, "vec_id",
                  checkpoint=ck2, compact_every=2, max_kl=kl))
    print(json.dumps({"sf_dir": sf_dir, "rows": emb.count(),
                      "stages_sec": t}))


if __name__ == "__main__":
    main()
