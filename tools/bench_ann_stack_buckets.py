#!/usr/bin/env python
"""Bucket-occupancy crossover for q_embedding_ann_stack's int8
candidate stage (r16, VERDICT r15 #5): the join+window form pays the
interpreted ``aggregate(zip_with(...))`` fold per PAIR (n·occupancy
rows), the per-bucket numpy Gram tile (``_int8_tile_topk``) pays one
B×B int64 matmul per bucket. Under ``planes_for`` sizing occupancy
stays ≈8 at every sandbox scale, so the r14/r15 "tile loses at sf0.1"
measurements never saw the regime where the cap (max_planes=24,
n > 2^24·8 ≈ 134M vectors — the 100 TB shape) makes buckets grow.
This tool buys the crossover point at 20k vectors (testdata_sf1) by
FORCING smaller plane counts, which produces exactly the bucket sizes
a capped index would hold, and times both forms on identical data in
one JVM, interleaved A-B-B-A per config so host drift cancels. The
three bench canary refs are timed first (report-only — the verdict is
a same-JVM A/B ratio, not an absolute).

Candidate equality is asserted per config (sorted (query, corpus)
pairs) — the values side of the gate is pinned by the pytest equality
suite; this asserts it held on the real table too.

Usage: python tools/bench_ann_stack_buckets.py [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CANARY = {"minhash_near_dup": 3.42, "pca_invariants": 3.53,
          "stream_near_dup": 7.13}
PLANE_CONFIGS = (12, 9, 7, 5)   # sized (occupancy ~5) … forced (~625)
REPS = 3


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from bda_spadochrony_spark.operators import similarity as S
    from bda_spadochrony_spark.session import get_session
    from bda_spadochrony_spark.sources.readers import scan

    spark = get_session("bda-ann-stack-buckets",
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    canary = {}
    for name in CANARY:
        qs[name](spark, "/root/testdata/sf0.001").count()   # plan-warm
        t0 = time.perf_counter()
        qs[name](spark, "/root/testdata/sf0.1").count()
        canary[name] = round(time.perf_counter() - t0, 3)
    ratios = {n: round(canary[n] / CANARY[n], 2) for n in CANARY}

    emb = scan(spark, os.path.join(REPO, "testdata_sf1",
                                   "embeddings.parquet"))
    n_vec = emb.count()
    idot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"),
        lambda acc, v: acc + v)

    def build_d(planes: int):
        pm = S.deterministic_planes(planes, 64)
        base = S.valid_vectors(emb, "embedding").select(
            F.col("vec_id"),
            F.col("embedding").cast("array<double>").alias("v"))
        base = S.with_hyperplane_bucket(base, "v", pm)
        qz = S.quantize_embeddings(emb, "vec_id").select("vec_id", "q")
        d = (base.join(qz, "vec_id")
             .withColumn("qn", F.sqrt(idot(F.col("q"), F.col("q"))
                                      .cast("double"))))
        return d.localCheckpoint(eager=False)

    def window_form(d):
        a = d.select(F.col("vec_id").alias("query_id"),
                     F.col("v").alias("qv"),
                     F.col("q").alias("qa"), F.col("qn").alias("qna"),
                     "bucket")
        b = d.select(F.col("vec_id").alias("corpus_id"),
                     F.col("v").alias("cv"),
                     F.col("q").alias("qb"), F.col("qn").alias("qnb"),
                     "bucket")
        pairs = (a.join(b, "bucket")
                 .where((F.col("query_id") != F.col("corpus_id")) &
                        (F.col("qna") > 0) & (F.col("qnb") > 0))
                 .withColumn("approx",
                             idot(F.col("qa"), F.col("qb"))
                             .cast("double") /
                             (F.col("qna") * F.col("qnb"))))
        w1 = Window.partitionBy("query_id").orderBy(
            F.col("approx").desc(), F.col("corpus_id").asc())
        return (pairs.withColumn("rn", F.row_number().over(w1))
                .where(F.col("rn") <= 10)
                .select("query_id", "qv", "corpus_id", "cv"))

    def timed(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    results = []
    for planes in PLANE_CONFIGS:
        d = build_d(planes)
        occ = (d.groupBy("bucket").count()
               .agg(F.count("*").alias("buckets"),
                    F.avg("count").alias("mean"),
                    F.max("count").alias("max")).collect()[0])
        win_df, tile_df = window_form(d), S._int8_tile_topk(d, 10)
        w_pairs = sorted((r["query_id"], r["corpus_id"])
                         for r in win_df.collect())
        t_pairs = sorted((r["query_id"], r["corpus_id"])
                         for r in tile_df.collect())
        assert w_pairs == t_pairs, f"planes={planes}: candidate mismatch"
        timed(win_df), timed(tile_df)            # warm both shapes
        w_t, t_t = [], []
        for _ in range(REPS):                    # A-B-B-A drift cancel
            w_t.append(timed(win_df))
            t_t.append(timed(tile_df))
            t_t.append(timed(tile_df))
            w_t.append(timed(win_df))
        results.append({
            "planes": planes, "buckets": occ["buckets"],
            "mean_occupancy": round(occ["mean"], 1),
            "max_occupancy": occ["max"],
            "join_window_sec": statistics.median(w_t),
            "tile_sec": statistics.median(t_t),
            "tile_speedup": round(statistics.median(w_t)
                                  / statistics.median(t_t), 2),
            "join_window_all": w_t, "tile_all": t_t,
            "n_pairs_equal": len(w_pairs)})
        print(json.dumps(results[-1]))

    payload = {"n_vectors": n_vec, "canary_ratios": ratios,
               "configs": results}
    print(json.dumps(payload))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1)


if __name__ == "__main__":
    main()
