"""Behavioral analytics operators: ordered funnels and cohort retention —
the two canonical product-analytics queries every event warehouse serves.

Scale shape: both are user-keyed aggregations. The funnel chains one
bounded (per-user, per-step) min-timestamp aggregate per step — k−1
user-keyed joins for a k-step funnel, each frame one row per qualifying
user; retention is two aggregates (cohort assignment, per-period activity)
joined on the user. No windows over the raw event stream, no self-joins of
events against events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bda_spadochrony_spark.functions.numeric import stable_round


def funnel_analysis(df: DataFrame, user_col: str, type_col: str,
                    ts_col: str, steps: list[str]) -> DataFrame:
    """Ordered funnel: for each step i, the number of users who performed
    step 1..i IN TEMPORAL ORDER (step i strictly after their qualifying
    step i−1), plus the conversion rate from step 1. A user's qualifying
    time for step i is the EARLIEST occurrence after their step-(i−1)
    time — the standard greedy semantics (earliest-entry maximizes
    downstream conversion, so the greedy choice is optimal).

    Returns one row per step: (step_order, step, n_users, conversion).
    """
    base = df.where(F.col(type_col).isin(steps)).select(
        F.col(user_col).alias("__u"), F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"))
    # each stage frame feeds BOTH its own count and the next step's join —
    # checkpoint (one row per qualifying user) or the union's branches
    # replay every upstream stage (AQE never cross-stage-reuses)
    cur = (base.where(F.col("__t") == steps[0])
           .groupBy("__u").agg(F.min("__ts").alias("__prev"))
           .localCheckpoint(eager=False))
    stages = [cur.select(F.lit(1).alias("step_order"),
                         F.lit(steps[0]).alias("step"),
                         F.lit(1).alias("__m"))]
    for i, step in enumerate(steps[1:], start=2):
        cur = (base.where(F.col("__t") == step)
               .join(cur, "__u")
               .where(F.col("__ts") > F.col("__prev"))
               .groupBy("__u").agg(F.min("__ts").alias("__prev"))
               .localCheckpoint(eager=False))
        stages.append(cur.select(F.lit(i).alias("step_order"),
                                 F.lit(step).alias("step"),
                                 F.lit(1).alias("__m")))
    # one distributed plan: union the per-step survivor frames (one row
    # per qualifying user, weight 1), count per step, derive conversion
    # from the k-row aggregate itself — no per-step driver actions.
    # Zero-survivor steps (r9 zero-row edge fixture: a step nobody
    # reaches — or an empty feed day — must report 0, the SQL-oracle
    # semantics) are handled by SEEDING the union with a weight-0 row
    # per step instead of left-joining counts onto the step list: the
    # seed folds into the existing aggregate (sum of weights), where
    # the r9 join added a broadcast-join stage that the round-10 A/B
    # measured ~0.5 s slower at sf0.1 with no semantic difference
    import functools
    seed = df.sparkSession.createDataFrame(
        [(i + 1, s, 0) for i, s in enumerate(steps)],
        "step_order: int, step: string, __m: int")
    all_stages = functools.reduce(
        lambda a, b: a.unionByName(b), stages).unionByName(seed)
    counts = (all_stages.groupBy("step_order", "step")
              .agg(F.sum("__m").alias("n_users")))
    first = counts.where(F.col("step_order") == 1).select(
        F.col("n_users").alias("__first"))
    return (counts.crossJoin(F.broadcast(first))
            .select(F.col("step_order").cast("int").alias("step_order"),
                    "step", "n_users",
                    stable_round(F.col("n_users") /
                                 F.greatest("__first", F.lit(1)), 4)
                    .alias("conversion")))


def cohort_retention(df: DataFrame, user_col: str, ts_col: str,
                     max_periods: int = 8) -> DataFrame:
    """Weekly cohort retention: users are assigned to the cohort of their
    FIRST activity week; for each (cohort_week, k) the count of cohort
    members active in week k after their first (k = floor(days/7) from
    the cohort week's start — relative arithmetic, so no engine
    week-truncation quirks enter the offsets). Returns
    (cohort_week, k, n_users) for k ≤ ``max_periods``.

    Two aggregates + one user-keyed join; activity is deduplicated to
    (user, k) before counting so multiple events in a week count once.
    """
    firsts = (df.groupBy(F.col(user_col).alias("__u"))
              .agg(F.min(ts_col).alias("__first")))
    cohorts = firsts.select(
        "__u", F.date_trunc("week", F.col("__first")).alias("__cw"))
    acts = (df.select(F.col(user_col).alias("__u"),
                      F.col(ts_col).alias("__ts"))
            .join(cohorts, "__u")
            .select("__u", "__cw",
                    F.floor(F.datediff(F.to_date("__ts"),
                                       F.to_date("__cw")) / 7)
                    .cast("int").alias("k"))
            .where(F.col("k") <= max_periods)
            .distinct())
    return (acts.groupBy(F.to_date("__cw").alias("cohort_week"), "k")
            .agg(F.count(F.lit(1)).alias("n_users")))
