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


def key_skew_diagnostics(df: DataFrame, key_col: str,
                         top_k: int = 10) -> DataFrame:
    """Pre-flight skew profiling for a prospective join/agg key: the
    ``top_k`` hottest key values with their row counts, corpus share, and
    the key-space context (distinct keys, max/avg skew factor) repeated on
    every row — the numbers that decide between a plain shuffle join,
    AQE splitting, and explicit salting BEFORE burning a 100 TB shuffle.

    One map-side-combined count shuffle keyed on the key; the global
    stats are a second aggregate over the (distinct-key-sized) count
    frame, broadcast back. Rank ties break to the smaller key string.
    The global top-k rank is pre-pruned per hash group (build_vocab's
    discipline) so its single-partition sort input is bounded even when
    the distinct-key table is itself huge.
    """
    from bda_spadochrony_spark.functions.numeric import stable_round
    from pyspark.sql import Window
    counts = (df.groupBy(F.col(key_col).cast("string").alias("key"))
              .agg(F.count(F.lit(1)).alias("n")))
    counts = counts.localCheckpoint(eager=False)  # feeds stats + top-k
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("total"),
        F.max("n").alias("max_n"),
        F.avg("n").alias("avg_n"))
    gw = (Window.partitionBy(F.pmod(F.xxhash64("key"), F.lit(64)))
          .orderBy(F.col("n").desc(), F.col("key").asc()))
    pruned = (counts.withColumn("gr", F.row_number().over(gw))
              .where(F.col("gr") <= top_k).drop("gr"))
    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    hot = (pruned.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= top_k))
    return (hot.crossJoin(F.broadcast(stats))
            .select(F.col("rank").cast("int").alias("rank"), "key", "n",
                    stable_round(F.col("n") / F.col("total"), 6)
                    .alias("share"),
                    "n_keys",
                    stable_round(F.col("max_n") / F.col("avg_n"), 4)
                    .alias("skew_factor")))


def join_cardinality_estimate(left: DataFrame, right: DataFrame,
                              left_key: str, right_key: str) -> DataFrame:
    """EXACT output cardinality of an equi join — without running the
    join: ``Σ_k n_left(k) · n_right(k)`` over the shared keys. The only
    shuffles are two map-side-combined count aggregates and a
    distinct-key-sized count join — never the data-sized join itself.
    The pre-flight answer to \"can this join's output even fit\" before
    committing a 100 TB shuffle (a fact-fact join with hot keys explodes
    quadratically; this surfaces it for the cost of two counts).

    Returns one row: (left_rows, right_rows, matching_keys, join_rows).
    """
    lc = (left.groupBy(F.col(left_key).alias("k"))
          .agg(F.count(F.lit(1)).alias("ln")))
    rc = (right.groupBy(F.col(right_key).alias("k"))
          .agg(F.count(F.lit(1)).alias("rn")))
    lc = lc.localCheckpoint(eager=False)   # each feeds a total AND the
    rc = rc.localCheckpoint(eager=False)   # key join; AQE won't reuse
    j = (lc.join(rc, "k")
         .agg(F.count(F.lit(1)).alias("matching_keys"),
              F.coalesce(F.sum(F.col("ln") * F.col("rn")), F.lit(0))
              .alias("join_rows")))
    lt = lc.agg(F.sum("ln").alias("left_rows"))
    rt = rc.agg(F.sum("rn").alias("right_rows"))
    return (lt.crossJoin(F.broadcast(rt)).crossJoin(F.broadcast(j))
            .select("left_rows", "right_rows", "matching_keys",
                    "join_rows"))


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
