#!/usr/bin/env python
"""Stage split for the raw-layout `stream_ann_index` headline query
(r16, VERDICT r15 #1 — the raw twin of tools/bench_pq_split.py):
replay the query's own stages in its own order with a timer around
each — fit (subset quantizer), drain1, drain2, search — in ONE fresh
JVM at sf0.1, plan-warmed the same way bench.py shards are (a full
sf0.001 pass of the same query first). The three bench canary refs are
timed FIRST (after the warm) so the split carries its window evidence
(the host is bimodal; single-shot probes are not evidence here).
Prints one JSON line.

Usage: python tools/bench_raw_split.py [TREE]
TREE defaults to this repo; pass a git worktree of a prior commit to
measure the before side on identical protocol.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

TREE = (os.path.abspath(sys.argv[1]) if len(sys.argv) > 1 else
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, TREE)

# bench.py CANARY_REF floors (sf0.1, 32-core healthy ledger)
CANARY = {"minhash_near_dup": 3.42, "pca_invariants": 3.53,
          "stream_near_dup": 7.13}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from bda_spadochrony_spark.operators.similarity import ann_index_topk
    from bda_spadochrony_spark.session import get_session
    from bda_spadochrony_spark.sources.readers import scan
    from bda_spadochrony_spark.streaming.ann_index import (
        stream_ann_index_build)
    from bda_spadochrony_spark.streaming.sources import file_stream
    assert entry_mod.__file__.startswith(TREE), entry_mod.__file__

    spark = get_session("bda-raw-split",
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # plan-warm: the whole query once at sf0.001 (bench.py shard rule)
    qs["stream_ann_index"](spark, "/root/testdata/sf0.001").count()

    canary = {}
    for name in CANARY:
        qs[name](spark, "/root/testdata/sf0.001").count()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        canary[name] = round(time.perf_counter() - t0, 3)
    ratios = {n: round(canary[n] / CANARY[n], 2) for n in CANARY}

    emb = scan(spark, f"{sf_dir}/embeddings.parquet")
    split, t_all = {}, time.perf_counter()

    t0 = time.perf_counter()
    centers = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").cast("int").alias("cell"),
        F.col("embedding").alias("centroid")).localCheckpoint()
    split["fit"] = round(time.perf_counter() - t0, 3)

    base = tempfile.mkdtemp(prefix="bda_raw_split_")
    in_dir, index, ckpt = f"{base}/in", f"{base}/index", f"{base}/ckpt"
    staged = emb.select("vec_id", "embedding")
    schema = staged.schema
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        staged.where(F.col("vec_id") % 2 == 0).write.parquet(f"{in_dir}/b0")
        t0 = time.perf_counter()
        stream_ann_index_build(
            file_stream(spark, f"{in_dir}/*/*.parquet", schema),
            index, centers, "vec_id", checkpoint=ckpt)
        split["drain1"] = round(time.perf_counter() - t0, 3)

        staged.where(F.col("vec_id") % 2 == 1).write.parquet(f"{in_dir}/b1")
        t0 = time.perf_counter()
        stream_ann_index_build(
            file_stream(spark, f"{in_dir}/*/*.parquet", schema),
            index, centers, "vec_id", checkpoint=ckpt)
        split["drain2"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        n = ann_index_topk(spark, index, emb, "vec_id",
                           centers=centers, k=3, n_probe=4).count()
        split["search"] = round(time.perf_counter() - t0, 3)
        split["total"] = round(time.perf_counter() - t_all, 3)
        print(json.dumps({"split": split, "rows": n, "tree": TREE,
                          "sf_dir": sf_dir, "canary_sec": canary,
                          "canary_ratios": ratios}))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
