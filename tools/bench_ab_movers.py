#!/usr/bin/env python
"""Same-window code A/B on named queries (VERDICT r14 #1): run each
query in a FRESH JVM on the CURRENT tree and on a reference worktree
(a prior round's code), interleaved A-B-B-A per query so host drift
cancels, with every child JVM also timing the three canary references
(batch + streaming classes) so the window temperature each number was
taken in is on the record — "zero code regression" claims must carry
their window evidence (the r14 lesson: an A/B against a mid-round
ledger said 1.08× while the final ledger was 1.32×).

Usage:
  python tools/bench_ab_movers.py REF_TREE Q1 [Q2 ...]        # parent
  python tools/bench_ab_movers.py --child TREE QUERY          # child

The parent prints one JSON line per measurement as it lands and a
final summary JSON with per-query medians for both trees and the
per-child canary ratios. Create the reference worktree first, e.g.:
  git worktree add /tmp/r13_tree <r13-round-commit>
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# current-tree canary floors (bench.py CANARY_REF) — used for BOTH
# trees: the canaries are untouched paths in every round since r10/r13,
# so the same floor reads the same window on either code
CANARY = {"minhash_near_dup": 3.42, "pca_invariants": 3.53,
          "stream_near_dup": 7.13}
ACTIONS = {"embedding_pq_stack": "count", "stream_ann_index_pq": "count",
           "embedding_ivf_pq": "count", "text_semantic_dedup": "count",
           "minhash_near_dup": "count", "pca_invariants": "count",
           "stream_near_dup": "count"}


def run_child(tree: str, query: str) -> None:
    sys.path.insert(0, tree)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_sf = "/root/testdata/sf0.001"
    from bda_spadochrony_spark.session import get_session  # noqa: E402
    import __spark_entry__ as entry_mod                    # noqa: E402
    assert entry_mod.__file__.startswith(tree), entry_mod.__file__

    spark = get_session("bda-ab-mover",
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    def timed(name: str) -> float:
        act = ACTIONS.get(name, "count")
        df = qs[name](spark, warm_sf)                      # plan-warm
        (df.collect if act == "collect" else df.count)()
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        (df.collect if act == "collect" else df.count)()
        return round(time.perf_counter() - t0, 3)

    canary = {n: timed(n) for n in CANARY}
    ratios = {n: round(canary[n] / CANARY[n], 2) for n in CANARY}
    t = timed(query)
    print(json.dumps({"tree": tree, "query": query, "sec": t,
                      "canary_ratios": ratios}))


def main() -> None:
    if sys.argv[1] == "--child":
        run_child(sys.argv[2], sys.argv[3])
        return
    ref_tree = os.path.abspath(sys.argv[1])
    queries = sys.argv[2:]
    results: dict[str, dict[str, list[float]]] = {
        q: {"current": [], "ref": []} for q in queries}
    canaries = []
    # per-child window gate (r15: the first run of this tool landed in a
    # bimodal-host window — canaries to 4.41x, one sample 4x its twin —
    # and produced an uncertifiable summary). Same discipline as
    # bench.py: a child whose hottest canary exceeds GATE is discarded
    # and retried after a backoff; the coolest attempt ships if all are
    # hot, and every discarded attempt is printed so the window history
    # is on the record.
    GATE, RETRIES, BACKOFF_S = 1.5, 5, 90.0
    for q in queries:
        # A-B-B-A: current, ref, ref, current
        for tree, slot in ((REPO, "current"), (ref_tree, "ref"),
                           (ref_tree, "ref"), (REPO, "current")):
            best = None
            for attempt in range(RETRIES + 1):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child",
                     tree, q],
                    capture_output=True, text=True, cwd=tree)
                if out.returncode != 0:
                    sys.stderr.write(out.stderr[-3000:])
                    raise SystemExit(f"child failed: {tree} {q}")
                payload = json.loads(out.stdout.strip().splitlines()[-1])
                payload["gate_ratio"] = max(payload["canary_ratios"].values())
                if best is None or payload["gate_ratio"] < best["gate_ratio"]:
                    best = payload
                if payload["gate_ratio"] <= GATE:
                    break
                print(json.dumps({**payload, "discarded": True}),
                      flush=True)
                if attempt < RETRIES:
                    time.sleep(BACKOFF_S)
            # explicit gate verdict on the shipped payload (r16, ADVICE
            # r15): when every attempt ran hot, the coolest one ships
            # into the summary but is tagged "gated": false — previously
            # it was re-printed bare after its own "discarded" line, and
            # the summary silently included a sample that never passed
            best["gated"] = best["gate_ratio"] <= GATE
            print(json.dumps(best), flush=True)
            results[q][slot].append(best["sec"])
            results[q].setdefault("ungated", 0)
            if not best["gated"]:
                results[q]["ungated"] += 1
            canaries.append(best["canary_ratios"])
    summary = {
        q: {"current_med": statistics.median(r["current"]),
            "ref_med": statistics.median(r["ref"]),
            "ratio": round(statistics.median(r["current"])
                           / statistics.median(r["ref"]), 3),
            "current": r["current"], "ref": r["ref"],
            # samples that shipped without ever passing the gate
            "ungated_samples": r.get("ungated", 0)}
        for q, r in results.items()}
    worst = {n: max(c[n] for c in canaries) for n in CANARY}
    print(json.dumps({"summary": summary, "worst_canary_ratio": worst,
                      "ref_tree": ref_tree}))


if __name__ == "__main__":
    main()
