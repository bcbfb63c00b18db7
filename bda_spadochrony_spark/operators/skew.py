"""Skew mitigation: salting for hot keys, bucketing for co-located joins.

AQE's skew-join splitting (on by default in the engine session) handles
moderate skew at runtime; these operators are for the pathological cases a
100 TB pipeline actually hits — a handful of keys holding 10-100× the
median partition — where pre-salting beats post-hoc splitting because the
*aggregation* itself is skewed, not just the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, keys: list[str], measures: list[Column],
               final_measures: list[Column], salt_buckets: int = 16) -> DataFrame:
    """Two-phase aggregation with a random salt: phase 1 aggregates on
    (keys, salt) — hot keys fan out over ``salt_buckets`` reducers — and
    phase 2 merges the partials on the true keys (tiny shuffle).

    ``measures`` are the phase-1 partial aggregates (e.g. ``F.count(...)
    .alias("c")``, ``F.sum(x).alias("s")``); ``final_measures`` merge them
    (``F.sum("c").alias("cnt")``, ``F.sum("s").alias("sum_x")``). Only
    decomposable aggregates qualify (sum/count/min/max and anything built
    from them, e.g. avg = sum-of-sums / sum-of-counts).
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt").agg(*measures)
    return phase1.groupBy(*keys).agg(*final_measures)


def salted_join(skewed: DataFrame, small: DataFrame, on: list[str],
                salt_buckets: int = 16, how: str = "inner") -> DataFrame:
    """Skewed-fact ⋈ small-table join without a hot partition: the skewed
    side gets a random salt; the small side is replicated ``salt_buckets``×
    (explode over the salt range) so every (key, salt) pair finds its
    match. Small-side replication cost is why this wants a genuinely small
    right side — same regime where you'd broadcast, but salting also fixes
    skewed *sort-merge* joins when the small side exceeds the broadcast
    threshold.

    Only join types that never emit unmatched SMALL-side rows are allowed —
    the small side is replicated ``salt_buckets``×, so a right/full outer
    would emit each unmatched small row once per salt."""
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"):
        raise ValueError(f"salted_join does not support how={how!r}: the "
                         "replicated small side would duplicate unmatched rows")
    salted = skewed.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    return salted.join(replicated, on=on + ["__salt"], how=how).drop("__salt")


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 32, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed table write: pre-hash-partitions rows into ``num_buckets``
    files per partition keyed on ``bucket_cols``. Two tables bucketed the
    same way join with ZERO shuffle (bucket-local sort-merge) — the
    pre-partitioning strategy for fact-fact joins repeated across runs,
    where re-shuffling 100 TB per join is the dominant cost."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
