#!/usr/bin/env python
"""Build-stage split for the ONE-SHOT ivf_pq family (r15): where do the
seconds of `embedding_ivf_pq` / `embedding_pq_stack` / `pq_codes` go —
driver-side Catalyst ANALYSIS of the literal-codebook expressions
(eager per-DataFrame-transformation), the bounded fit collects, or
executor work? Times, in one fresh plan-warmed JVM at $SPARK_GRAFT_SF_DIR:

- fit: pq_codebooks (scan + orderBy/limit collect)
- encode_build: pq_encode(df, ..., codebooks) DataFrame construction
  ONLY (eager analysis, no action)
- encode_exec: noop-sink run of the encoded frame
- lut_build: the _pq_lut_expr withColumn construction (analysis only)
- assign_build: _assign_cells construction (analysis only)
- q_build / q_exec: the full q_embedding_ivf_pq builder + noop action

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from bda_spadochrony_spark.operators.similarity import (
        _assign_cells, _pq_lut_expr, cells_for, pq_codebooks, pq_encode,
        pq_reconstruct, valid_vectors)
    from bda_spadochrony_spark.session import get_session
    from bda_spadochrony_spark.sources.readers import scan

    spark = get_session("bda-ivfpq-split",
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # plan-warm (bench.py shard rule): the full query once at sf0.001
    entry_mod.queries()["embedding_ivf_pq"](
        spark, "/root/testdata/sf0.001").count()
    entry_mod.queries()["pq_codes"](spark, "/root/testdata/sf0.001").count()

    emb = scan(spark, f"{sf_dir}/embeddings.parquet")
    split = {}

    t0 = time.perf_counter()
    n = emb.count()
    cbs = pq_codebooks(emb, "vec_id", m=8, k=16)
    split["fit_codebooks"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    enc = pq_encode(emb, "vec_id", codebooks=cbs)
    split["encode_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    enc.write.format("noop").mode("overwrite").save()
    split["encode_exec"] = round(time.perf_counter() - t0, 3)

    base = valid_vectors(emb, "embedding").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"))
    t0 = time.perf_counter()
    lutted = base.withColumn("lut", _pq_lut_expr("v", cbs))
    split["lut_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    lutted.write.format("noop").mode("overwrite").save()
    split["lut_exec"] = round(time.perf_counter() - t0, 3)

    rows = base.orderBy("id").limit(cells_for(n)).collect()
    center_rows = list(enumerate(r["v"] for r in rows))
    t0 = time.perf_counter()
    asg = _assign_cells(base, center_rows, "long")
    split["assign_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    asg.write.format("noop").mode("overwrite").save()
    split["assign_exec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    rec = enc.withColumn("r", pq_reconstruct("codes", cbs))
    split["reconstruct_build"] = round(time.perf_counter() - t0, 3)

    for qname in ("pq_codes", "embedding_ivf_pq", "embedding_pq_stack"):
        t0 = time.perf_counter()
        df = entry_mod.queries()[qname](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        split[f"{qname}_build"] = round(t1 - t0, 3)
        split[f"{qname}_exec"] = round(t2 - t1, 3)

    print(json.dumps(split))


if __name__ == "__main__":
    main()
