#!/usr/bin/env python
"""A/B harness for the round-over-round bench regression (VERDICT r5 ask
#2): run an EXACT prior-round query set — by default round 4's 54
queries — in a FRESH session on the current code, with bench.py's exact
methodology (one warmup action, then time build+action per query), and
print the per-query comparison against the recorded BENCH_r{N}.json.

Separates "the code got slower" from "the bench session got heavier":
bench.py runs ~90 plans in one JVM (codegen-cache pressure, GC); this
harness runs only the prior round's set, so a clean result here while
bench.py regresses pins the cause on session load, not plan changes.

Usage: python tools/bench_ab.py [BENCH_r04.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACTIONS = {name: act for name, act in __import__("bench").HEADLINE}


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(repo, "BENCH_r04.json")
    ref = json.load(open(ref_path))["parsed"]["queries"]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bda_spadochrony_spark.session import get_session
    import __spark_entry__ as entry_mod

    spark = get_session("bda-bench-ab",
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    qs["hourly_agg"](spark, sf_dir).count()

    now: dict[str, float] = {}
    for name in ref:
        if name not in qs:
            print(f"{name}: GONE from registry")
            continue
        action = ACTIONS.get(name, "count")
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        (df.collect if action == "collect" else df.count)()
        now[name] = round(time.perf_counter() - t0, 3)

    tot_ref = sum(v for k, v in ref.items() if k in now)
    tot_now = sum(now.values())
    rows = sorted(now, key=lambda k: now[k] - ref[k], reverse=True)
    for name in rows:
        d = now[name] - ref[name]
        flag = " <<<" if d > 0.5 else ""
        print(f"{name:28s} ref={ref[name]:5.1f} now={now[name]:6.2f} "
              f"delta={d:+6.2f}{flag}")
    print(json.dumps({"ref_total": round(tot_ref, 2),
                      "now_total": round(tot_now, 2),
                      "ratio": round(tot_now / tot_ref, 3),
                      "n": len(now)}))


if __name__ == "__main__":
    main()
