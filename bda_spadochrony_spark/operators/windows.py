"""Window aggregates (SURVEY §2.5 W1-W2).

The reference's range-frame windows are UNPARTITIONED —
``Window().orderBy("timestamp_unix").rangeBetween(0, 3600)``
(``pyspark/ML_stock.py:161-171``, ``ML_tomtom.py:175-181``) — which Spark
executes in a single partition: correct, but a scale cliff. The engine keeps
the exact semantics behind ``range_frame_agg`` and offers the scale path:
``partition_by`` (e.g. by date, when frames never cross partition bounds) or
the streaming twin ``time_window_agg`` (tumbling/sliding event-time windows,
which distribute freely).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_frame_agg(df: DataFrame, order_col: str,
                    frame: tuple[int, int],
                    measures: list[tuple[Column, str]],
                    partition_by: list[str] | None = None) -> DataFrame:
    """Range-frame window aggregate: for each row, aggregate over rows whose
    ``order_col`` lies in ``[row + frame[0], row + frame[1]]``.

    W1 (forward rolling sum of next-hour transactions,
    ``pyspark/ML_stock.py:161-171``) is ``frame=(0, 3600)`` with
    ``F.sum``; W2 (forward avg, ``ML_tomtom.py:175-181``) likewise with
    ``F.avg``. ``measures`` is ``[(agg_column, alias), ...]``.

    ``partition_by=None`` reproduces the reference's global window
    (single-partition execution — fine for post-aggregate frames, wrong for
    raw 100 TB; pass date-grain partitions there).
    """
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    w = w.orderBy(order_col).rangeBetween(frame[0], frame[1])
    out = df
    for m, alias in measures:
        out = out.withColumn(alias, m.over(w))
    return out


def time_window_agg(df: DataFrame, ts_col: str, window_duration: str,
                    slide_duration: str | None = None,
                    keys: list[str] | None = None,
                    measures: list[Column] | None = None) -> DataFrame:
    """Tumbling/sliding event-time window aggregate — the distributed /
    streaming counterpart of W1-W2 (SURVEY §2.5 note, §2.7 absent-ops row):
    ``F.window(ts, "1 hour", slide)`` + groupBy. Works identically on batch
    and watermarked streaming frames; state is bounded by the watermark."""
    win = F.window(F.col(ts_col), window_duration, slide_duration or window_duration)
    agged = df.groupBy(win.alias("window"), *(keys or [])) \
              .agg(*(measures or [F.count(F.lit(1)).alias("cnt")]))
    rest = [c for c in agged.columns if c != "window"]
    return agged.select(F.col("window.start").alias("window_start"),
                        F.col("window.end").alias("window_end"), *rest)


def session_window_agg(df: DataFrame, ts_col: str, gap: str,
                       keys: list[str] | None = None,
                       measures: list[Column] | None = None) -> DataFrame:
    """Session-window aggregate (``F.session_window``): merges events into
    per-key sessions closed by ``gap`` of inactivity; window end = last
    event + gap. Works on batch and watermarked streams — the built-in
    counterpart of the custom ``streaming.stateful.sessionize`` (use that
    one when you need per-session state beyond aggregates, e.g. emitting
    only closed sessions incrementally)."""
    win = F.session_window(F.col(ts_col), gap)
    agged = df.groupBy(win.alias("session"), *(keys or [])) \
              .agg(*(measures or [F.count(F.lit(1)).alias("cnt")]))
    rest = [c for c in agged.columns if c != "session"]
    return agged.select(F.col("session.start").alias("session_start"),
                        F.col("session.end").alias("session_end"), *rest)


def analytic_window(df: DataFrame, partition_by: list[str],
                    order_by: list[Column],
                    measures: list[tuple[Column, str]],
                    frame: tuple[int, int] | None = None) -> DataFrame:
    """Generic analytic-window application: every ``(expr, alias)`` in
    ``measures`` is evaluated over the SAME partitioned/ordered window —
    lag/lead/first_value/percent_rank/ntile/running aggregates (absent from
    the reference, SURVEY §2.5 absent-ops row; table stakes for any
    feature-engineering pipeline).

    ``frame`` (rowsBetween bounds) applies only to frame-accepting
    aggregates — pass e.g. ``(Window.unboundedPreceding, Window.currentRow)``
    for running totals via a second call. One shuffle on ``partition_by``
    shared by all measures; navigation functions add no extra exchange."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    if frame is not None:
        w = w.rowsBetween(*frame)
    out = df
    for m, alias in measures:
        out = out.withColumn(alias, m.over(w))
    return out


def ranked(df: DataFrame, partition_by: list[str], order_by: list[Column],
           rank_col: str = "rn") -> DataFrame:
    """row_number ranking — absent from the reference (§2.5) but required
    by the engine's top-k / dedup-keep-first operators; partitioned, so it
    distributes (one shuffle on ``partition_by``)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w))


def top_k_per_group(df: DataFrame, partition_by: list[str],
                    order_by: list[Column], k: int) -> DataFrame:
    """Top-k rows per group via partitioned row_number — the distributed
    top-k idiom (no global sort; sort happens within hash partitions)."""
    return ranked(df, partition_by, order_by).filter(F.col("rn") <= k).drop("rn")
