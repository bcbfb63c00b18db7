"""Exact distributed heavy hitters: a Misra-Gries candidate pass plus an
exact candidate-restricted count — the standard two-pass trick that finds
every key with frequency > phi * N over any data size WITHOUT shuffling the
full distinct-key table.

Why not just ``groupBy(key).count()``? At 100 TB the distinct-key table
(tokens, URLs, user ids) is itself enormous: the full-count shuffle moves
one row per distinct key per map partition. The two-pass plan moves only

  pass 1:  p * (k+1) rows        (p = partitions, k = ceil(1/phi) counters)
  pass 2:  rows matching the <= p*k candidate keys, semi-joined map-side
           via broadcast, then a shuffle over <= p*k distinct keys

and the OUTPUT IS PROVABLY IDENTICAL to the naive plan: Misra-Gries
summaries are mergeable (Agarwal et al., "Mergeable Summaries", PODS'12) —
any key with global frequency > N/(k+1) survives in at least one
partition's summary (if f_p(x) <= n_p/(k+1) in every partition, summing
gives f(x) <= N/(k+1)). With k = ceil(1/phi), phi*N >= N/(k+1), so the
candidate set contains every true heavy hitter; the exact second pass then
removes false positives. The sketch affects PERFORMANCE only, never the
answer — which is what lets the operator carry a plain SQL oracle
(``HAVING count(*) > phi * total``).

The per-partition summary is maintained with VECTORIZED batch merges, not
per-row Python: each Arrow batch is reduced with ``value_counts`` (C speed)
and merged into the running counter set with the MG merge (add, subtract
the (k+1)-th largest counter, drop non-positives). State is O(k) per
partition regardless of input size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def misra_gries_summary(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """One pass over ``df``: per-partition Misra-Gries candidate keys plus
    the partition's row count.

    Returns rows ``(key_col, n_rows)``: candidate keys carry ``n_rows=0``;
    one sentinel row per partition carries ``key_col=NULL`` and the
    partition's total row count (so callers get candidates AND the exact
    global N from the same single scan). NULL input keys are ignored
    (filter or fill them upstream if they matter).
    """
    field = df.schema[key_col]
    out_schema = StructType([
        StructField(field.name, field.dataType, True),
        StructField("n_rows", LongType(), False),
    ])

    def run(batches):
        import pandas as pd
        counters = pd.Series(dtype="int64")
        n = 0
        for pdf in batches:
            n += len(pdf)
            batch = pdf[key_col].value_counts()  # vectorized, drops NULLs
            counters = counters.add(batch, fill_value=0)
            if len(counters) > k:
                # MG merge: subtract the (k+1)-th largest counter value
                # from everything, drop non-positives -> at most k survive
                dec = counters.nlargest(k + 1).iloc[-1]
                counters = counters - dec
                counters = counters[counters > 0]
        yield pd.DataFrame({
            field.name: list(counters.index) + [None],
            "n_rows": [0] * len(counters) + [n],
        })

    return df.select(key_col).mapInPandas(run, out_schema)


def heavy_hitters(df: DataFrame, key_col: str, phi: float,
                  k: int | None = None) -> DataFrame:
    """Every key with frequency strictly greater than ``phi * N`` and its
    EXACT count — identical output to
    ``SELECT key, count(*) ... HAVING count(*) > phi * N`` at any scale,
    computed without shuffling the full distinct-key table (see module
    docstring for the guarantee). NULL keys are excluded.

    ``k`` (the per-partition counter budget) defaults to ``ceil(1/phi)``,
    the smallest value that preserves the guarantee; raise it to shrink
    the false-positive candidate set at the cost of summary size.
    """
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    if k is None:
        k = int(math.ceil(1.0 / phi))
    if k + 1 < math.ceil(1.0 / phi):
        raise ValueError(f"k={k} too small for phi={phi}: need >= ceil(1/phi)-1")
    rows = df.where(F.col(key_col).isNotNull())
    # tiny (p*(k+1) rows) but feeds two consumers; checkpoint so the scan
    # isn't replayed (AQE never reuses an exchange across stages)
    summary = misra_gries_summary(rows, key_col, k).localCheckpoint(eager=False)
    total = summary.agg(F.sum("n_rows").alias("__total"))
    cands = summary.where(F.col(key_col).isNotNull()).select(key_col).distinct()
    counts = (rows.join(F.broadcast(cands), key_col, "left_semi")
              .groupBy(key_col).agg(F.count(F.lit(1)).alias("n")))
    return (counts.crossJoin(F.broadcast(total))
            .where(F.col("n") > F.lit(float(phi)) * F.col("__total"))
            .drop("__total"))
