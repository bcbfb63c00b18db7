#!/usr/bin/env python
"""Focused 10x scale refresh for the r15 kernel-touched family: one
fresh JVM per scale, warm each query at sf0.001, then time it at the
target sf (the tools/bench_scale.py shard protocol). Child mode:
  python tools/bench_scale_kernels.py --child <sf_dir>
Parent prints one JSON line per scale and the factors.
"""
import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

QUERIES = [
    "pq_codes", "embedding_pq_stack", "embedding_ivf_pq",
    "embedding_ivf_pq_kmeans", "stream_ann_index", "stream_ann_index_pq",
    "bpe_encode", "bpe_artifact_encode", "tokenizer_bytes_trained",
    "text_semantic_dedup", "semantic_dedup", "semantic_dedup_probed",
]


def child(sf_dir: str) -> None:
    from bda_spadochrony_spark.session import get_session
    import __spark_entry__ as entry_mod
    spark = get_session("bda-scale-kernels",
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    for name in QUERIES:
        try:
            qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
    out = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        out[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"sf_dir": sf_dir, "times": out}))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return
    res = {}
    for sf_dir in ["/root/testdata/sf0.1", os.path.join(REPO, "testdata_sf1")]:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", sf_dir],
            capture_output=True, text=True, cwd=REPO)
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-3000:])
            raise SystemExit(f"child failed: {sf_dir}")
        payload = json.loads(out.stdout.strip().splitlines()[-1])
        print(json.dumps(payload), flush=True)
        res[sf_dir] = payload["times"]
    lo, hi = res["/root/testdata/sf0.1"], res[os.path.join(REPO, "testdata_sf1")]
    print(json.dumps({"factors": {q: round(hi[q] / lo[q], 2)
                                  for q in QUERIES}}))


if __name__ == "__main__":
    main()
