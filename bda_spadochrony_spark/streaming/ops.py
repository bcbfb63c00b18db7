"""Streaming operators (SURVEY §2.7 T1-T4).

State-store discipline is the scale story here: every stateful op below is
bounded by a watermark, so executor state stays proportional to the
watermark horizon × key cardinality, not to stream history. The reference
gets this right for its interval join (1-minute watermarks + ±30 s bound,
``pyspark/stream_combined.py:174-198``) and the engine generalizes it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bda_spadochrony_spark.operators.joins import interval_join


def with_watermark(df: DataFrame, ts_col: str, delay: str = "1 minutes") -> DataFrame:
    """T1 — event-time watermark (reference ``pyspark/stream_combined.py:174,182``)."""
    return df.withWatermark(ts_col, delay)


def state_partitions_for(n_rows: int, rows_per_partition: int = 31_250,
                         lo: int = 8, hi: int = 200) -> int:
    """Size ``spark.sql.shuffle.partitions`` for a stateful streaming
    query FROM the expected input volume — the streaming sibling of
    ``similarity.planes_for`` (round 7, measured): the partition count
    binds to the state store at first checkpoint, every micro-batch
    writes one state file per partition, so too many partitions is pure
    file churn at small state (the r4 lesson that pinned sp=8) while too
    FEW serializes the state machine at large state. A/B at the 10×
    fixture: the signature full-outer join drain took 134 s at the
    sf0.1-tuned sp=8 and 67 s at sp=32 — state partitions must scale
    with state volume, not stay at either scale's tuned constant.
    Default sizing: one partition per ~31k input rows, clamped to
    [``lo``, ``hi``] (sf0.01/sf0.1 stay at the proven 8; 1M rows → 32).
    """
    import math
    return max(lo, min(hi, math.ceil(n_rows / rows_per_partition)))


def stream_dedup(df: DataFrame, keys: list[str], ts_col: str,
                 delay: str = "1 minutes") -> DataFrame:
    """T2 — watermarked streaming dedup. The reference intended this
    (commented at 4 sites, e.g. ``pyspark/stream_combined.py:71,173,181``);
    the engine ships it enabled. State = one entry per key within the
    watermark horizon."""
    return df.withWatermark(ts_col, delay).dropDuplicates(keys)


def stream_windowed_distinct(df: DataFrame, ts_col: str, key_col: str,
                             window: str,
                             delay: str = "1 minutes") -> DataFrame:
    """EXACT per-window distinct-key counts on a stream. Spark forbids
    ``count(DISTINCT ...)`` in streaming aggregates, and
    ``approx_count_distinct`` trades exactness for state — the standard
    exact pattern is dedup-then-count: a watermarked ``dropDuplicates``
    on (window, key) collapses each key to one row per window (state =
    one entry per distinct (window, key) inside the watermark horizon),
    and a plain windowed count over the deduped stream is then the exact
    distinct count. Two stateful stages, both watermark-bounded.

    NULL keys are excluded — ``count(DISTINCT key)`` semantics (SQL
    skips NULLs), pinned explicitly rather than left to dropDuplicates'
    keep-one-NULL-row behavior which would count NULL as a key.

    Late-data caveat: rows arriving later than ``delay`` behind the
    stream's max event time are DROPPED by the watermark once input
    spans multiple micro-batches out of order — exact parity with a
    batch ``count(DISTINCT)`` holds only when ``delay`` covers the
    input's event-time disorder (callers comparing against an exact
    batch oracle should size it to the data's spread; the multi-batch
    drain test pins this).
    """
    win = F.window(F.col(ts_col), window)
    deduped = (df.where(F.col(key_col).isNotNull())
               .withWatermark(ts_col, delay)
               .select(F.col(ts_col), F.col(key_col),
                       win.alias("__w"))
               .dropDuplicates(["__w", key_col]))
    return (deduped.groupBy("__w")
            .agg(F.count(F.lit(1)).alias("distinct_keys"))
            .select(F.col("__w.start").alias("window_start"),
                    "distinct_keys"))


def stream_static_join(stream: DataFrame, static: DataFrame,
                       on: list[str] | Column, how: str = "inner",
                       broadcast_static: bool = True) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    CURRENT snapshot of the static side — the standard dimension-table
    enrichment (stream of facts × slowly-changing dim). Stateless on the
    stream side (no watermark needed for an inner/left join; Spark
    re-plans the static side per batch, so a refreshed dim table is
    picked up between batches). ``broadcast_static`` hints the dim
    broadcast — at 100 TB the fact stream never shuffles for the join;
    only dims above the broadcast threshold fall back to a shuffled join.
    """
    s = F.broadcast(static) if broadcast_static else static
    return stream.join(s, on, how)


def stream_interval_join(left: DataFrame, right: DataFrame,
                         left_ts: str, right_ts: str,
                         tolerance_seconds: float = 30.0,
                         extra_eq: list[tuple[str, str]] | None = None,
                         how: str = "fullOuter",
                         watermark: str = "1 minutes") -> DataFrame:
    """T3/J6 — watermarked stream-stream interval join (reference
    ``pyspark/stream_combined.py:190-198``). Both sides watermarked; outer
    rows emit only once the watermark passes the join bound, so tests must
    advance event time past (watermark + tolerance) to flush them.

    Spark requires an equality conjunct on stream-stream joins (it keys the
    symmetric-hash state store on it). When ``extra_eq`` is absent the
    engine adds the reference's same-date equality derived from each side's
    event time — with the reference's documented caveat that pairs within
    tolerance but straddling midnight don't match."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    drop_cols: list[str] = []
    if not extra_eq:
        l = l.withColumn("__l_date", F.to_date(F.col(left_ts)))
        r = r.withColumn("__r_date", F.to_date(F.col(right_ts)))
        extra_eq = [("__l_date", "__r_date")]
        drop_cols = ["__l_date", "__r_date"]
    out = interval_join(l, r, left_ts, right_ts, tolerance_seconds,
                        extra_eq=extra_eq, how=how)
    return out.drop(*drop_cols) if drop_cols else out


def windowed_agg(df: DataFrame, ts_col: str, window: str,
                 keys: list[str] | None = None,
                 measures: list[Column] | None = None,
                 delay: str = "1 minutes", slide: str | None = None) -> DataFrame:
    """Tumbling/sliding event-time aggregate — the streaming counterpart of
    the batch range-frame windows W1/W2 (SURVEY §2.5 note). Watermark bounds
    the aggregation state; append mode emits a window once it's final."""
    win = F.window(F.col(ts_col), window, slide or window)
    return (df.withWatermark(ts_col, delay)
              .groupBy(win.alias("window"), *(keys or []))
              .agg(*(measures or [F.count(F.lit(1)).alias("cnt")]))
              .select(F.col("window.start").alias("window_start"),
                      F.col("window.end").alias("window_end"), "*")
              .drop("window"))
