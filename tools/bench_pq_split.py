#!/usr/bin/env python
"""Stage split for the `stream_ann_index_pq` headline query (r13
protocol, re-run on demand — VERDICT r14 #3): replay the query's own
stages in its own order with a timer around each — fits (subset
quantizer + PQ codebooks), drain1, drain2 (no auto-compact), compact
(explicit, so its cost is its own line), search — in ONE fresh JVM at
sf0.1, plan-warmed the same way bench.py shards are (a full sf0.001
pass of the same query first). Prints one JSON line. The floors note
in bench.py says reopen the 16 s-class floor only if the SEARCH leg
grows past ~6 s — this split is the instrument that answers which leg
moved.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from bda_spadochrony_spark.operators.similarity import (
        ann_index_compact, ann_index_pq_topk, cells_for, pq_codebooks,
        valid_vectors)
    from bda_spadochrony_spark.session import get_session
    from bda_spadochrony_spark.sources.readers import scan
    from bda_spadochrony_spark.streaming.ann_index import (
        stream_ann_index_build_pq)
    from bda_spadochrony_spark.streaming.sources import file_stream

    spark = get_session("bda-pq-split",
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # plan-warm: the whole query once at sf0.001 (bench.py shard rule)
    entry_mod.queries()["stream_ann_index_pq"](
        spark, "/root/testdata/sf0.001").count()

    emb = scan(spark, f"{sf_dir}/embeddings.parquet")
    split, t_all = {}, time.perf_counter()

    t0 = time.perf_counter()
    n_cells = cells_for(emb.count())
    basev = valid_vectors(emb, "embedding").select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v"))
    rows = basev.orderBy("vec_id").limit(n_cells).collect()
    centers = spark.createDataFrame(
        [(i, [float(x) for x in r["v"]]) for i, r in enumerate(rows)],
        "cell: int, centroid: array<double>").localCheckpoint()
    cbs = pq_codebooks(emb, "vec_id")
    split["fits"] = round(time.perf_counter() - t0, 3)

    base = tempfile.mkdtemp(prefix="bda_pq_split_")
    in_dir, index, ckpt = f"{base}/in", f"{base}/index", f"{base}/ckpt"
    staged = emb.select("vec_id", "embedding")
    schema = staged.schema
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        staged.where(F.col("vec_id") % 2 == 0).write.parquet(f"{in_dir}/b0")
        t0 = time.perf_counter()
        stream_ann_index_build_pq(
            file_stream(spark, f"{in_dir}/*/*.parquet", schema),
            index, centers, cbs, "vec_id", checkpoint=ckpt)
        split["drain1"] = round(time.perf_counter() - t0, 3)

        staged.where(F.col("vec_id") % 2 == 1).write.parquet(f"{in_dir}/b1")
        t0 = time.perf_counter()
        stream_ann_index_build_pq(
            file_stream(spark, f"{in_dir}/*/*.parquet", schema),
            index, centers, cbs, "vec_id", checkpoint=ckpt)
        split["drain2"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        folded = ann_index_compact(spark, index)
        split["compact"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        n = ann_index_pq_topk(spark, index, emb, "vec_id", vectors=emb,
                              centers=centers, codebooks=cbs, k=3,
                              n_candidates=10, n_probe=2).count()
        split["search"] = round(time.perf_counter() - t0, 3)
        split["total"] = round(time.perf_counter() - t_all, 3)
        print(json.dumps({"split": split, "folded": folded, "rows": n,
                          "sf_dir": sf_dir}))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
