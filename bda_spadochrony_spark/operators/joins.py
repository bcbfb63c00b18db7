"""Joins (SURVEY §2.3 J1-J6).

Strategy notes for scale (the engine's job is to hand Catalyst a plan it can
pick the right physical join for):
- Equi joins on explicit key lists → Catalyst chooses broadcast-hash when one
  side fits ``spark.sql.autoBroadcastJoinThreshold`` (post-aggregate frames
  almost always do), else sort-merge; AQE re-plans at runtime using real
  sizes and splits skewed partitions.
- ``broadcast=True`` forces the hint for known-small dimensions (e.g. the
  nation/region tables of a star schema) — at 100 TB a mis-chosen
  sort-merge against a 25-row dim is a full shuffle of the fact table.
- The interval join is expressed as an equi prefix (date equality) + time
  range, so the streaming state store keys by date and evicts by watermark +
  bound (reference ``pyspark/stream_combined.py:190-198``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_join(left: DataFrame, right: DataFrame, on: list[str],
              how: str = "inner", broadcast: bool = False) -> DataFrame:
    """Multi-key equi join (J1-J5; reference ``pyspark/batch_openweather.py:105``
    2-key, ``batch_tomtom.py:102-111`` 4-key chained, ``batch_tomtom.py:121``
    3-key roll-up). ``how`` passes through every Spark join type (the
    reference enumerates inner/leftOuter/rightOuter/leftSemi as intended
    options at ``stream_combined.py:197``)."""
    r = F.broadcast(right) if broadcast else right
    return left.join(r, on=on, how=how)


def join_chain(base: DataFrame, others: list[tuple[DataFrame, list[str]]],
               how: str = "inner") -> DataFrame:
    """Chained multi-key joins (J2; reference chains 4 joins on
    ``['date','hour','iconCategory','id']`` at ``batch_tomtom.py:102-111``).
    Same keys across links ⇒ one shuffle partitioning is reused by every
    sort-merge link instead of re-shuffling per join."""
    out = base
    for df, keys in others:
        out = out.join(df, on=keys, how=how)
    return out


def fuzzy_best_match(left: DataFrame, right: DataFrame,
                     block_on: list[str], left_id: str, right_id: str,
                     left_text: str, right_text: str,
                     max_distance: int | None = None,
                     keep_unmatched: bool = False) -> DataFrame:
    """Entity-resolution join: for each left row, its single BEST right
    match by edit distance — restricted to rows sharing the blocking
    key(s), the discipline that keeps record linkage off the cross
    product (candidate space = Σ per-block |L|·|R|, not |L|·|R|; pick
    blocks like region/zip/phonetic-key so blocks stay small). Ties
    break to the smallest right id.

    Matching semantics (ADVICE r5): the default output is INNER on the
    block key — a left row whose block has no right-side rows, or whose
    block key is NULL, produces no output row even when ``max_distance``
    is None; ``max_distance`` additionally drops left rows whose best
    candidate is too far. Pass ``keep_unmatched=True`` for the
    left-outer variant: every left id survives, unmatched ones with a
    NULL ``right_id``/``distance``.

    One blocked equi join (broadcast when the right side is a dim) + a
    struct-min per left id — no windows, no cross join. The verify
    expression is JVM levenshtein, fully codegen'd; the unmatched
    re-attach is one extra join keyed on the (already aggregated,
    match-sized) best frame.
    """
    l = left.select(*block_on, F.col(left_id),
                    F.col(left_text).alias("__lt"))
    r = right.select(*block_on, F.col(right_id),
                     F.col(right_text).alias("__rt"))
    j = l.join(r, block_on)
    dist = F.levenshtein("__lt", "__rt")
    if max_distance is not None:
        j = j.where(dist <= max_distance)
    best = (j.groupBy(left_id)
            .agg(F.min(F.struct(dist.alias("distance"),
                                F.col(right_id))).alias("__b")))
    out = best.select(left_id,
                      F.col(f"__b.{right_id}").alias(right_id),
                      F.col("__b.distance").alias("distance"))
    if keep_unmatched:
        out = (left.select(left_id)
               .join(out, left_id, "left"))
    return out


def interval_join(left: DataFrame, right: DataFrame,
                  left_ts: str, right_ts: str,
                  tolerance_seconds: float = 30.0,
                  extra_eq: list[tuple[str, str]] | None = None,
                  how: str = "fullOuter") -> DataFrame:
    """Time-interval join: ``right_ts ∈ [left_ts − tol, left_ts + tol]``
    plus optional extra equality conjuncts (J6/T3; reference
    ``pyspark/stream_combined.py:190-198`` — date equality AND ±30 s,
    ``how="fullOuter"``).

    Works on batch frames (Catalyst range join) and on two watermarked
    streams (StreamingSymmetricHashJoin with state eviction from the
    watermark + bound). Column names must be disjoint apart from the
    ``extra_eq`` pairs; callers rename beforehand, as the reference does
    with its ``_weather``/``_stock`` suffixes.
    """
    tol = f"interval {int(round(tolerance_seconds * 1000))} milliseconds"
    cond = (F.col(right_ts) >= F.expr(f"{left_ts} - {tol}")) & \
           (F.col(right_ts) <= F.expr(f"{left_ts} + {tol}"))
    for lcol, rcol in (extra_eq or []):
        cond = cond & (F.col(lcol) == F.col(rcol))
    return left.join(right, on=cond, how=how)


def binned_interval_join(left: DataFrame, right: DataFrame,
                         left_ts: str, right_ts: str,
                         tolerance_seconds: float = 30.0,
                         extra_eq: list[tuple[str, str]] | None = None) -> DataFrame:
    """Scale path for the interval join WITHOUT an equality conjunct.

    ``interval_join`` hands Catalyst a pure range predicate; with no equi
    key that plans as a nested-loop — quadratic, a non-starter at 100 TB.
    This variant buckets both sides into tolerance-width time bins and
    equi-joins on the bin: a right row within ±tol of a left row lands in
    the left row's bin or an adjacent one, so the LEFT side explodes to
    its 3 candidate bins (3× one side, never |L|×|R|) and the exact range
    predicate refines after the hash join. Each qualifying pair matches on
    exactly one bin value, so no dedup is needed. Inner-join semantics
    (identical rows to ``interval_join(..., how="inner")``)."""
    tol_ms = int(round(tolerance_seconds * 1000))
    bin_ms = F.lit(tol_ms)
    # cast via timestamp_ltz: NTZ → double is an analysis error, and with
    # the session tz pinned to UTC the NTZ→LTZ cast is value-preserving
    l_ms = (F.col(left_ts).cast("timestamp_ltz").cast("double") * 1000).cast("long")
    r_ms = (F.col(right_ts).cast("timestamp_ltz").cast("double") * 1000).cast("long")
    l = left.withColumn("__bin", F.explode(F.array(
        F.floor(l_ms / bin_ms) - 1, F.floor(l_ms / bin_ms),
        F.floor(l_ms / bin_ms) + 1)))
    r = right.withColumn("__bin", F.floor(r_ms / bin_ms))
    tol = f"interval {tol_ms} milliseconds"
    cond = (l["__bin"] == r["__bin"]) & \
           (F.col(right_ts) >= F.expr(f"{left_ts} - {tol}")) & \
           (F.col(right_ts) <= F.expr(f"{left_ts} + {tol}"))
    for lcol, rcol in (extra_eq or []):
        cond = cond & (F.col(lcol) == F.col(rcol))
    return l.join(r, on=cond, how="inner").drop("__bin")


def as_of_align(left: DataFrame, right: DataFrame, left_ts: str, right_ts: str,
                grain: str = "minute", how: str = "inner") -> DataFrame:
    """Truncation-based temporal alignment (J5; reference aligns weather
    features to windowed targets by ``date_trunc('minute', ts)`` equi join,
    ``pyspark/ML_stock.py:125,175``). Cheaper than a true as-of join when
    both feeds share a cadence: plain equi join on the truncated timestamp,
    shuffle on a single well-distributed key."""
    lk, rk = f"__{left_ts}_trunc", f"__{right_ts}_trunc"
    l = left.withColumn(lk, F.date_trunc(grain, F.col(left_ts)))
    r = right.withColumn(rk, F.date_trunc(grain, F.col(right_ts)))
    return l.join(r, on=l[lk] == r[rk], how=how).drop(lk, rk)
