"""Slowly-changing-dimension (SCD type 2) history building — the
warehouse-side temporal-table operator: turn an observation log of
attribute values into versioned validity intervals.

Scale shape: everything is ONE key-partitioned window pass (lag for change
detection, lead for interval close) — shuffle keyed on the dimension key,
bounded per-key state, no self-joins. The same pass works as the MERGE
step of an incremental SCD2 pipeline: union the current snapshot with the
new observations and rebuild the affected keys' intervals (only the keys
present in the update batch need reprocessing — semi-join first, exactly
like ``dedup.incremental_dedup``'s batch-vs-corpus discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def point_in_time_join(facts: DataFrame, dim: DataFrame, key_col: str,
                       fact_ts_col: str,
                       valid_from_col: str = "valid_from",
                       valid_to_col: str = "valid_to",
                       how: str = "inner") -> DataFrame:
    """Point-in-time (temporal validity) join: each fact row picks the
    dimension VERSION that was valid at its timestamp —
    ``fact.ts ∈ [valid_from, valid_to)`` with NULL ``valid_to`` = still
    current. The correctness half of SCD2: a plain key join to a
    versioned dim double-counts; this join is what makes the history
    usable. Half-open intervals mean a fact AT a version boundary joins
    the NEW version, and each fact matches at most one version.

    Plan: an equi join on the dimension key carries the range predicate
    as a post-join filter — SortMergeJoin/BroadcastHashJoin on the key,
    never a nested loop, because SCD2 intervals per key are disjoint by
    construction (at most one survives the filter; no fan-out).
    """
    f = facts.alias("f")
    d = dim.alias("d")
    cond = ((F.col(f"f.{key_col}") == F.col(f"d.{key_col}")) &
            (F.col(f"f.{fact_ts_col}") >= F.col(f"d.{valid_from_col}")) &
            (F.col(f"d.{valid_to_col}").isNull() |
             (F.col(f"f.{fact_ts_col}") < F.col(f"d.{valid_to_col}"))))
    return f.join(d, cond, how).drop(F.col(f"d.{key_col}"))


def scd2_history(df: DataFrame, key_col: str, attr_cols: list[str],
                 ts_col: str) -> DataFrame:
    """Build the SCD2 history from an observation log: per key, order
    observations by time, drop rows where no tracked attribute changed
    (consecutive dedup — re-observing the same value extends the current
    interval), and emit one row per VERSION with ``valid_from`` /
    ``valid_to`` (NULL = still current) and an ``is_current`` flag.

    Ties on the timestamp break deterministically on the attribute tuple
    so the history is reproducible under any partitioning. Two boundary
    ties at the SAME instant produce an empty first interval
    ``[ts, ts)`` — a fact at that instant lands in the later version
    (half-open semantics), so facts still match at most one version.

    NULL semantics (pinned round 7, edge-fixture program): observations
    with a NULL timestamp are DROPPED — a validity interval cannot
    anchor on an unknown time, and engines disagree on NULL ordering
    inside windows (Spark NULLS FIRST vs SQL NULLS LAST), so keeping
    them makes the history partitioning-/engine-dependent. Change
    detection is NULL-SAFE: an attribute flipping to or from NULL IS a
    version change (two consecutive NULL observations still merge); the
    first observation per key is kept by an explicit row-number marker
    rather than ``lag IS NULL``, which would mis-read a NULL attribute
    in the previous row as 'first row'.
    """
    attrs = [F.col(c) for c in attr_cols]
    w = (Window.partitionBy(key_col)
         .orderBy(F.col(ts_col).asc(), *[a.asc() for a in attrs]))
    tagged = df.where(F.col(ts_col).isNotNull()).select(
        F.col(key_col), F.col(ts_col), *attrs,
        F.struct(*attrs).alias("__a"),
        F.lag(F.struct(*attrs)).over(w).alias("__prev"),
        F.row_number().over(w).alias("__rn"))
    changed = tagged.where(
        (F.col("__rn") == 1) |
        ~F.col("__a").eqNullSafe(F.col("__prev")))
    w2 = (Window.partitionBy(key_col)
          .orderBy(F.col(ts_col).asc(), *[a.asc() for a in attrs]))
    return (changed.select(
        key_col, *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"))
        .withColumn("is_current",
                    F.col("valid_to").isNull().cast("int")))
