#!/usr/bin/env python
"""Dump ``explain('formatted')`` for named contract queries to files —
the r15 optimization round's before/after plan evidence
(``plans/r15/<query>_{before,after}.txt``).

Usage:
  python tools/dump_named_plans.py TREE OUTDIR SUFFIX Q1 [Q2 ...]

TREE is the repo root to import the contract from (the current tree, or
a git worktree of a prior commit for the "before" side). Streaming /
drain-in-builder queries return a localCheckpoint-backed result whose
plan is uninformative; for those the stage splits in
OPTIMIZATION_r15.md are the evidence and the dump still records what
explain shows.
"""

from __future__ import annotations

import io
import os
import sys

from contextlib import redirect_stdout


def main() -> None:
    tree, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    sys.path.insert(0, tree)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from bda_spadochrony_spark.session import get_session
    assert entry_mod.__file__.startswith(tree), entry_mod.__file__

    spark = get_session("bda-plan-dump",
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"dumped {name}_{suffix}")


if __name__ == "__main__":
    main()
